"""Targeted gate: run ONLY the named queries against their oracles.

Usage: cd /tmp && python /root/repo/tools/gate_one.py name1 name2 [--sf DIR] [--cpus N]

Same normalization as gate_sim.py; for iterating on new queries without
paying the full 197-query sweep.
"""
import os
import sys, math, datetime

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duckdb
from pyspark.sql import SparkSession

if os.path.realpath(os.getcwd()) == os.path.realpath("/root/repo"):
    sys.exit("run from /tmp (or any non-repo cwd), not the repo root")

args = sys.argv[1:]
SF = "/root/testdata/sf0.01"
if "--sf" in args:
    i = args.index("--sf")
    SF = args[i + 1]
    args = args[:i] + args[i + 2:]
CPUS = 8
if "--cpus" in args:
    i = args.index("--cpus")
    CPUS = int(args[i + 1])
    args = args[:i] + args[i + 2:]
NAMES = args
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

from gate_sim_lib import norm_rows  # noqa: E402  (shared normalization)


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        # large-SF targeted runs need headroom; the default 1g JVM OOMs
        # at sf1 (the driver's own gate runs at sf0.01 where 1g is fine)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    fails = []
    for name in NAMES:
        fn = qs[name]
        try:
            df = fn(spark, SF)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(srows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name}: oracle error {e}")
            continue
        if sorted(scols) != sorted(ocols):
            fails.append(name)
            print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(ocols)}")
            continue
        sn, on = norm_rows(scols, srows), norm_rows(ocols, orows)
        if sn != on:
            diff = next((i for i in range(min(len(sn), len(on))) if sn[i] != on[i]), None)
            msg = f"rows {len(sn)} vs {len(on)}"
            if diff is not None:
                msg += f"; first diff @{diff}: {sn[diff]} vs {on[diff]}"
            fails.append(name)
            print(f"FAIL {name}: {msg}")
        else:
            print(f"OK {name}: {len(sn)} rows")
    sys.exit(1 if fails else 0)


main()
