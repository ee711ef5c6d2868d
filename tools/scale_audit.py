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
   (same normalization as gate_sim). Large result -> the query is
   executed-only on the Spark side (recorded as such).
2. Spark runs the query to completion — collect for compared queries,
   noop write (full physical execution, no driver transfer) for
   large-output ones — with a cancelAllJobs watchdog timeout.

Output: one line per query `STATUS name spark_s oracle_s rows note`, and
a sorted slow-tail summary. Exit 1 on any MISMATCH/ERROR (timeouts and
large-output executed-only rows are reported, not failures).

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
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


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
            r"^(?:OK|ok\(rows-only\)|BIG|MISMATCH|ERROR|TIMEOUT|ORACLE-\w+) (\S+?):? "
        )
        with open(skip_log) as fh:
            for line in fh:
                m = pat.match(line)
                if m:
                    done.add(m.group(1).rstrip(":"))
        qs = {n: f for n, f in qs.items() if n not in done}
        print(f"resume: skipping {len(done)} already-audited queries", flush=True)

    def run_oracle(sql):
        """(rows, cols, elapsed, status) — status in ok|big|timeout|error."""
        hit_timeout = threading.Event()

        def interrupt():
            hit_timeout.set()
            con.interrupt()

        timer = threading.Timer(ORACLE_TIMEOUT, interrupt)
        timer.start()
        t0 = time.perf_counter()
        try:
            res = con.execute(sql)
            cols = [d[0] for d in res.description]
            rows = res.fetchmany(ROW_CAP + 1)
            dt = time.perf_counter() - t0
            if len(rows) > ROW_CAP:
                return None, cols, dt, "big"
            return rows, cols, dt, "ok"
        except Exception as e:  # noqa: BLE001
            dt = time.perf_counter() - t0
            if hit_timeout.is_set():
                return None, None, dt, "timeout"
            return None, str(e)[:200], dt, "error"
        finally:
            timer.cancel()

    def run_spark(fn, collect):
        """(rows_or_None, elapsed, status)."""
        done = threading.Event()

        def watchdog():
            if not done.wait(SPARK_TIMEOUT):
                spark.sparkContext.cancelAllJobs()

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF)
            if collect:
                rows = [tuple(r) for r in df.collect()]
                return rows, df.columns, time.perf_counter() - t0, "ok"
            df.write.format("noop").mode("overwrite").save()
            return None, df.columns, time.perf_counter() - t0, "ok"
        except Exception as e:  # noqa: BLE001
            dt = time.perf_counter() - t0
            status = "timeout" if dt >= SPARK_TIMEOUT - 1 else "error"
            return None, str(e)[:200], dt, status
        finally:
            done.set()

    for name, fn in qs.items():
        o_rows = o_cols = None
        o_dt, o_status = 0.0, "none"
        if name in oracles:
            o_rows, o_cols, o_dt, o_status = run_oracle(oracles[name])
        compare = o_status == "ok"
        s_rows, s_cols, s_dt, s_status = run_spark(fn, collect=compare)

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
        elif o_status == "big":
            line = (
                f"BIG {name}: executed-only (oracle > {ROW_CAP} rows) "
                f"[spark {s_dt:.1f}s oracle {o_dt:.1f}s]"
            )
        elif not compare:
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
        rows_out.append((s_dt, o_dt, line))
        print(line, flush=True)

    print("\n--- slow tail (by spark seconds) ---", flush=True)
    for s_dt, o_dt, line in sorted(rows_out, reverse=True)[:20]:
        print(f"{s_dt:7.1f}s  {line.split(' [')[0]}", flush=True)
    n_bad = len(fails)
    print(f"\n{len(qs) - n_bad}/{len(qs)} clean; failures: {fails}", flush=True)
    sys.exit(1 if n_bad else 0)


main()
