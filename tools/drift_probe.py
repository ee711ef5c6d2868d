#!/usr/bin/env python3
"""Targeted timing probe for the r8 quiet-box drift triage (r8 verdict
directive #6): `dedup_duplicate_groups` (3.63->4.18s warm),
`dedup_semdedup_profile` (5.35->5.72s), `cluster_geo_pipeline_cellgrid`
(3.72->4.08s) — all ~10-15% up between the r7 and r8 sidecars on
unchanged code.

These three are DRIVER-ROUNDTRIP-bound (iterative collect probes:
CC convergence sums, k-means centroid refits), which the bench's
shuffle-throughput calibration constant cannot normalize — the r8
sidecar's calibration was FASTER than r7's (1.22 vs 1.54s) while these
three got slower, so the drift is either scheduler/driver latency or
sequence-dependent JVM state, not shuffle weather.

This probe times each query in BOTH conditions in one process:
  isolated-first: fresh session, probe queries only (no preceding bench
    sequence) — if this reproduces r7 numbers, the drift is bench-
    sequence JVM state (block-manager/JIT carryover);
  post-ballast: after a synthetic ballast loop that mimics the bench's
    preceding JVM pressure (localCheckpoint blocks + many small jobs).

Prints one JSON line. Run on a QUIET box (it also records load).

Usage: python tools/drift_probe.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

PROBES = (
    "dedup_duplicate_groups",
    "dedup_semdedup_profile",
    "cluster_geo_pipeline_cellgrid",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from bigdatanycdiseasesurveillance_spark.registry import all_specs
    from bigdatanycdiseasesurveillance_spark.session import get_spark

    spark = get_spark("drift-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # same worker-pool warm-up as bench.py so the first mapInPandas
    # query doesn't pay 32 forks
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for name in PROBES:
        cold = round(run(name), 4)
        ws = sorted(run(name) for _ in range(3))
        out[name] = {"isolated_cold": cold, "isolated_warm": round(ws[0], 4),
                     "isolated_spread_abs": round(ws[2] - ws[0], 4)}

    # ballast: the small-job + localCheckpoint pressure a full bench
    # sequence leaves behind in the driver/executor JVM
    for _ in range(6):
        df = (
            spark.range(0, 2_000_000, 1, 32)
            .withColumn("k", F.col("id") % 1000)
            .groupBy("k")
            .agg(F.sum("id").alias("s"))
            .localCheckpoint(eager=True)
        )
        for _ in range(5):
            df.agg(F.sum("s")).collect()  # many tiny jobs

    for name in PROBES:
        ws = sorted(run(name) for _ in range(3))
        out[name]["post_ballast_warm"] = round(ws[0], 4)
        out[name]["post_ballast_spread_abs"] = round(ws[2] - ws[0], 4)

    print(
        json.dumps(
            {
                "probe": out,
                "sf_dir": sf_dir,
                "load_avg_1m": round(os.getloadavg()[0], 2),
                "r7_sidecar_warm": {
                    "dedup_duplicate_groups": 3.6254,
                    "dedup_semdedup_profile": 5.3517,
                    "cluster_geo_pipeline_cellgrid": 3.7179,
                },
                "r8_sidecar_warm": {
                    "dedup_duplicate_groups": 4.1835,
                    "dedup_semdedup_profile": 5.7243,
                    "cluster_geo_pipeline_cellgrid": 4.0824,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
