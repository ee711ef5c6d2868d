#!/usr/bin/env python3
"""Scale audit: run EVERY registry query at a large SF, timed, with
adaptive oracle checking — built for the sf1 (10x bench) datapoint.

Why not gate_sim at sf1: the t2 gate collects both result sets into
Python and sorts normalized tuples — fine at sf0.01, but at sf1 several
verification surfaces emit 10^6-10^7 rows and the DRIVER-side Python
normalization dominates by hours while proving nothing new (value parity
already holds at sf0.001/0.01/0.1). What an sf1 point is FOR is finding
super-linear ENGINE surfaces and timing the slow tail. So per query:

1. DuckDB runs the oracle capped at ROW_CAP+1 fetched rows (timed, with
   an interrupt-based timeout). Small result -> full value compare
   (same normalization as gate_sim). Large result -> CHECKSUM compare:
   both sides stream through an identical canonical per-row serializer
   into an order-insensitive (count, sum-of-md5) digest, so sf1 still
   compares VALUES without a 10^7-row driver-side sort (r7 verdict
   directive #2 — "executed-only" was the one tier where a scale-only
   wrong answer could hide).
2. Spark runs the query to completion — collect for compared queries,
   distributed rdd.mapPartitions digest for checksum ones (no driver
   row transfer) — with a cancelAllJobs watchdog timeout.

Output: one line per query `STATUS name spark_s oracle_s rows note`, and
a sorted slow-tail summary. Exit 1 on any MISMATCH/ERROR (timeouts are
reported, not failures).

Usage:
  cd /tmp && SPARK_GRAFT_CPUS=24 SPARK_GRAFT_DRIVER_MEM=48g \
      python /root/repo/tools/scale_audit.py /root/repo/.data/sf1
"""

import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb
from pyspark.sql import SparkSession

from gate_sim_lib import norm_rows  # noqa: E402

if os.path.realpath(os.getcwd()) == os.path.realpath("/root/repo"):
    sys.exit("run from /tmp (or any non-repo cwd), not the repo root")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf1"
ROW_CAP = int(os.environ.get("SPARK_GRAFT_AUDIT_ROWCAP", "200000"))
ORACLE_TIMEOUT = float(os.environ.get("SPARK_GRAFT_AUDIT_ORACLE_TIMEOUT", "600"))
SPARK_TIMEOUT = float(os.environ.get("SPARK_GRAFT_AUDIT_SPARK_TIMEOUT", "900"))
# extra budget for streaming a >ROW_CAP oracle result through the digest
CHECKSUM_TIMEOUT = float(os.environ.get("SPARK_GRAFT_AUDIT_CHECKSUM_TIMEOUT", "1800"))
# entries whose FIRST spark run is at least this slow get one solo
# re-timing pass at the end of the audit, so before/after tables compare
# work, not box weather (r8 verdict directive #4: dedup_duplicate_groups
# showed a 5x phantom regression on unchanged code under contention)
RETIME_THRESH = float(os.environ.get("SPARK_GRAFT_AUDIT_RETIME_THRESH", "100"))
# per-query oracle-timeout overrides: dedup_source_overlap_matrix's
# DuckDB side lands right on the 600s global cap under mild contention
# (605s in r8, cleared solo) — give it headroom instead of a re-run
ORACLE_TIMEOUT_OVERRIDES = {"dedup_source_overlap_matrix": 900.0}
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


# ---------------------------------------------------------------------------
# Order-insensitive value checksum for >ROW_CAP results.
#
# The full-compare path (norm_rows) defines equality as Python == on
# round-6 normalized tuples. The checksum path needs a CANONICAL BYTE
# STRING per cell instead, identical for any pair of cells the gate
# would call equal across the two engines' Python type surfaces
# (duckdb fetch vs Spark Row): int 3 == float 3.0 == Decimal('3.00'),
# Decimal('1.50') == float 1.5, -0.0 == 0.0, NaN ~ NULL. Both sides run
# THIS function, so any residual canon quirk fails loudly as a
# MISMATCH-CHECKSUM, never silently passes.
# ---------------------------------------------------------------------------
_MD5_MASK = (1 << 128) - 1


def canon_cell(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "\x00"
    if v is True:
        return "b1"
    if v is False:
        return "b0"
    t = type(v)
    if t is int:
        return repr(v)
    if t is float or isinstance(v, decimal.Decimal):
        f = float(v)
        if math.isnan(f):
            return "\x00"  # norm_cell maps NaN -> None
        r = round(f, 6)
        if r == 0:
            return "0"  # collapse IEEE -0.0 (same sf1 find as norm_cell)
        if r.is_integer():
            # unconditional: int(r) is exact for ANY integral float, and
            # the old abs(r) < 1e15 guard split BIGINT 10**15 from DOUBLE
            # 1e15 ('1000000000000000' vs '1e+15') though Python == — the
            # full-compare relation — calls them equal (r8 advisor)
            return repr(int(r))
        return repr(r)
    if t is str:
        return "s" + v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return "d" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "y" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        # length-prefix each element: a raw join lets a separator-bearing
        # string shift element boundaries (r8 advisor)
        return "[" + "".join(
            "%d:%s" % (len(c), c) for c in (canon_cell(x) for x in v)
        ) + "]"
    return "r" + repr(v)


def digest_rows(rows, order):
    """Fold an iterable of row tuples into (count, sum-of-md5 mod 2^128).

    `order` is the column permutation that sorts column names — the same
    alignment norm_rows uses — so both engines hash cells identically."""
    import hashlib

    n, acc = 0, 0
    for r in rows:
        # length-prefixed cells, not a separator join: a str cell can
        # contain ANY byte, so ('a\x1fsb','c') must not collide with
        # ('a','b\x1fsc') in the multiset digest (r8 advisor)
        key = "".join(
            "%d:%s" % (len(c), c) for c in (canon_cell(r[i]) for i in order)
        )
        h = hashlib.md5(key.encode("utf-8", "surrogatepass")).digest()
        acc = (acc + int.from_bytes(h, "big")) & _MD5_MASK
        n += 1
    return n, acc


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.driver.memory", mem)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # bound DuckDB's memory and give it a spill directory: an untamed
    # oracle can MemoryError the process mid-audit (and a dead interrupt
    # thread then wedges the whole run) — spilling is the safe failure
    con.execute(
        "SET memory_limit='%s'" % os.environ.get("SPARK_GRAFT_DUCK_MEM", "24GB")
    )
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    # cap oracle threads: per-thread aggregate/CTE state scales with
    # thread count and duckdb's limit does not cover all of it — at 24+
    # threads the tok_bpe_merges recursive CTE malloc-failed the whole
    # process at sf1 (r8 find); at 8 threads it completes in ~200s.
    # Result order is irrelevant (compares are order-insensitive).
    con.execute("SET threads=%d" % int(os.environ.get("SPARK_GRAFT_DUCK_THREADS", "8")))
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    fails, rows_out = [], []

    # resume support: skip names already logged by a previous run
    # (SPARK_GRAFT_AUDIT_SKIP=<path to prior log>)
    skip_log = os.environ.get("SPARK_GRAFT_AUDIT_SKIP")
    if skip_log and os.path.exists(skip_log):
        import re

        done = set()
        pat = re.compile(
            r"^(?:OK-CHECKSUM|MISMATCH-CHECKSUM|OK-ALTPROOF|MISMATCH-ALTPROOF"
            r"|OK|ok\(rows-only\)|BIG"
            r"|MISMATCH|ERROR|TIMEOUT|ORACLE-\w+) (\S+?):? "
        )
        with open(skip_log) as fh:
            for line in fh:
                m = pat.match(line)
                if m:
                    done.add(m.group(1).rstrip(":"))
        qs = {n: f for n, f in qs.items() if n not in done}
        print(f"resume: skipping {len(done)} already-audited queries", flush=True)

    def run_oracle(sql, timeout=None):
        """(rows_or_digest, cols, elapsed, status) — status in
        ok|bigsum|timeout|error. A >ROW_CAP result streams the remaining
        rows through digest_rows and returns the (count, sum) digest."""
        hit_timeout = threading.Event()

        def interrupt():
            hit_timeout.set()
            con.interrupt()

        timer = threading.Timer(timeout or ORACLE_TIMEOUT, interrupt)
        timer.start()
        t0 = time.perf_counter()
        try:
            res = con.execute(sql)
            cols = [d[0] for d in res.description]
            rows = res.fetchmany(ROW_CAP + 1)
            if len(rows) > ROW_CAP:
                # value checksum instead of executed-only: restart the
                # clock with the (larger) checksum budget and fold every
                # row — the ROW_CAP+1 already fetched plus the rest.
                timer.cancel()
                timer = threading.Timer(CHECKSUM_TIMEOUT, interrupt)
                timer.start()
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                n, acc = digest_rows(rows, order)
                del rows
                while True:
                    chunk = res.fetchmany(65536)
                    if not chunk:
                        break
                    cn, cacc = digest_rows(chunk, order)
                    n += cn
                    acc = (acc + cacc) & _MD5_MASK
                return (n, acc), cols, time.perf_counter() - t0, "bigsum"
            return rows, cols, time.perf_counter() - t0, "ok"
        except Exception as e:  # noqa: BLE001
            dt = time.perf_counter() - t0
            if hit_timeout.is_set():
                return None, None, dt, "timeout"
            return None, str(e)[:200], dt, "error"
        finally:
            timer.cancel()

    def run_spark(fn, mode):
        """(payload, cols, elapsed, status); mode in collect|digest|noop.

        digest mode computes the same (count, sum-of-md5) checksum as the
        oracle side, but DISTRIBUTED: each partition folds its rows in a
        Python worker (df.rdd hands workers the same Python type surface
        as driver collect — datetime/Decimal/list), and only the tiny
        per-partition (count, acc) pairs reach the driver."""
        done = threading.Event()
        timeout = CHECKSUM_TIMEOUT if mode == "digest" else SPARK_TIMEOUT

        def watchdog():
            if not done.wait(timeout):
                spark.sparkContext.cancelAllJobs()

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF)
            if mode == "collect":
                rows = [tuple(r) for r in df.collect()]
                return rows, df.columns, time.perf_counter() - t0, "ok"
            if mode == "digest":
                cols = df.columns
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                parts = df.rdd.mapPartitions(
                    lambda it: [digest_rows(it, order)]
                ).collect()
                n = sum(p[0] for p in parts)
                acc = sum(p[1] for p in parts) & _MD5_MASK
                return (n, acc), cols, time.perf_counter() - t0, "ok"
            df.write.format("noop").mode("overwrite").save()
            return None, df.columns, time.perf_counter() - t0, "ok"
        except Exception as e:  # noqa: BLE001
            dt = time.perf_counter() - t0
            status = "timeout" if dt >= timeout - 1 else "error"
            return None, str(e)[:200], dt, status
        finally:
            done.set()

    only = os.environ.get("SPARK_GRAFT_AUDIT_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        qs = {n: f for n, f in qs.items() if n in keep}
        print(f"only: restricted to {len(qs)} queries", flush=True)

    # Dual-plan value proofs for rows whose DuckDB oracle TIMES OUT:
    # compare the registry plan against an independently-labeled Spark
    # twin (tools/alt_twins.py — connected_components-based, itself
    # sf1-exact via dedup_duplicate_groups). The oracle is ALWAYS tried
    # first — at small SFs the recursive-CTE oracle finishes and is the
    # stronger independent-engine evidence (r9 review finding); the twin
    # only backstops a timeout. SPARK_GRAFT_AUDIT_ALT_DIRECT=1 skips the
    # oracle attempt for twin-covered names (saves 3 x ORACLE_TIMEOUT at
    # sf1, where r8 proved those oracles infeasible even solo at 1500s).
    try:
        from alt_twins import ALT_TWINS
    except Exception as e:  # noqa: BLE001 — audit must run without the module
        print(f"alt_twins unavailable ({e}); oracle timeouts stay timeouts", flush=True)
        ALT_TWINS = {}
    alt_direct = bool(os.environ.get("SPARK_GRAFT_AUDIT_ALT_DIRECT"))

    retime_jobs = []  # (name, fn, mode, first_s_dt)

    def run_altproof(name, fn, o_dt, o_status):
        """Registry-vs-twin full value compare; returns the log line."""
        s_rows, s_cols, s_dt, s_status = run_spark(fn, "collect")
        if s_status != "ok":
            fails.append(name)
            return s_dt, f"ERROR {name}: spark {s_status} after {s_dt:.0f}s ({s_cols})"
        if s_dt >= RETIME_THRESH:
            retime_jobs.append((name, fn, "collect", s_dt))
        a_rows, a_cols, a_dt, a_status = run_spark(ALT_TWINS[name], "collect")
        why = (
            f"oracle {o_status} {o_dt:.0f}s"
            if o_status != "none"
            else "oracle skipped: documented-infeasible (ALT_DIRECT)"
        )
        if a_status != "ok":
            fails.append(name)
            return s_dt, f"ERROR {name}: alt-twin {a_status} after {a_dt:.0f}s ({a_cols})"
        if sorted(s_cols) != sorted(a_cols):
            fails.append(name)
            return s_dt, (
                f"MISMATCH-ALTPROOF {name}: schema {sorted(s_cols)} vs {sorted(a_cols)}"
            )
        sn, an = norm_rows(s_cols, s_rows), norm_rows(a_cols, a_rows)
        if sn != an:
            fails.append(name)
            return s_dt, f"MISMATCH-ALTPROOF {name}: rows {len(sn)} vs {len(an)}"
        return s_dt, (
            f"OK-ALTPROOF {name}: {len(sn)} rows value-equal vs "
            f"independent-CC twin ({why}) [spark {s_dt:.1f}s twin {a_dt:.1f}s]"
        )

    for name, fn in qs.items():
        if alt_direct and name in ALT_TWINS:
            s_dt, line = run_altproof(name, fn, 0.0, "none")
            rows_out.append((s_dt, 0.0, line))
            print(f"{line} load={os.getloadavg()[0]:.1f}", flush=True)
            continue

        o_rows = o_cols = None
        o_dt, o_status = 0.0, "none"
        if name in oracles:
            o_rows, o_cols, o_dt, o_status = run_oracle(
                oracles[name], ORACLE_TIMEOUT_OVERRIDES.get(name)
            )
        if o_status == "timeout" and name in ALT_TWINS:
            s_dt, line = run_altproof(name, fn, o_dt, o_status)
            rows_out.append((s_dt, o_dt, line))
            print(f"{line} load={os.getloadavg()[0]:.1f}", flush=True)
            continue
        mode = {"ok": "collect", "bigsum": "digest"}.get(o_status, "noop")
        s_rows, s_cols, s_dt, s_status = run_spark(fn, mode)

        if s_status != "ok":
            tag = "TIMEOUT" if s_status == "timeout" else "ERROR"
            line = f"{tag} {name}: spark {s_status} after {s_dt:.0f}s ({s_cols})"
            if tag == "ERROR":
                fails.append(name)
        elif o_status in ("timeout", "error"):
            line = (
                f"ORACLE-{o_status.upper()} {name}: spark ok {s_dt:.1f}s; "
                f"oracle {o_dt:.0f}s"
            )
            if o_status == "error":
                fails.append(name)
        elif o_status == "bigsum":
            if sorted(s_cols) != sorted(o_cols):
                fails.append(name)
                line = (
                    f"MISMATCH-CHECKSUM {name}: schema "
                    f"{sorted(s_cols)} vs {sorted(o_cols)}"
                )
            elif s_rows != o_rows:
                fails.append(name)
                line = (
                    f"MISMATCH-CHECKSUM {name}: spark (n={s_rows[0]}, "
                    f"sum={s_rows[1]:#x}) vs oracle (n={o_rows[0]}, "
                    f"sum={o_rows[1]:#x})"
                )
            else:
                line = (
                    f"OK-CHECKSUM {name}: {s_rows[0]} rows digest-equal "
                    f"[spark {s_dt:.1f}s oracle {o_dt:.1f}s]"
                )
        elif o_status == "none":
            line = f"ok(rows-only) {name} [spark {s_dt:.1f}s]"
        else:
            if sorted(s_cols) != sorted(o_cols):
                fails.append(name)
                line = f"MISMATCH {name}: schema {sorted(s_cols)} vs {sorted(o_cols)}"
            else:
                sn, on = norm_rows(s_cols, s_rows), norm_rows(o_cols, o_rows)
                if sn != on:
                    fails.append(name)
                    line = f"MISMATCH {name}: rows {len(sn)} vs {len(on)}"
                else:
                    line = (
                        f"OK {name}: {len(sn)} rows "
                        f"[spark {s_dt:.1f}s oracle {o_dt:.1f}s]"
                    )
        if s_status == "ok" and s_dt >= RETIME_THRESH:
            retime_jobs.append((name, fn, mode, s_dt))
        rows_out.append((s_dt, o_dt, line))
        # 1-min load average at entry end: a before/after table can now
        # tell contention from regression (r8 verdict directive #4)
        print(f"{line} load={os.getloadavg()[0]:.1f}", flush=True)

    # Solo re-timing pass for the slow tail: one extra run of each
    # >= RETIME_THRESH entry, same mode, after all oracle work is done —
    # reproduce-within-2x evidence inside a single audit artifact.
    if retime_jobs:
        print(f"\n--- retime pass ({len(retime_jobs)} entries >= {RETIME_THRESH:.0f}s) ---", flush=True)
        for name, fn, mode, first_dt in retime_jobs:
            _, _, second_dt, r_status = run_spark(fn, mode)
            ratio = max(first_dt, second_dt) / max(min(first_dt, second_dt), 1e-9)
            tag = "RETIME" if r_status == "ok" and ratio <= 2.0 else "RETIME-DIVERGED"
            print(
                f"{tag} {name}: first {first_dt:.1f}s second {second_dt:.1f}s "
                f"ratio {ratio:.2f} load={os.getloadavg()[0]:.1f}",
                flush=True,
            )

    print("\n--- slow tail (by spark seconds) ---", flush=True)
    for s_dt, o_dt, line in sorted(rows_out, reverse=True)[:20]:
        print(f"{s_dt:7.1f}s  {line.split(' [')[0]}", flush=True)
    n_bad = len(fails)
    print(f"\n{len(qs) - n_bad}/{len(qs)} clean; failures: {fails}", flush=True)
    sys.exit(1 if n_bad else 0)


main()
