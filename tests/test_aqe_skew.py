"""AQE skew-join pin: the engine's automatic answer to hot keys.

`operators/skew.py` is the explicit salting escape hatch; this test
pins the AUTOMATIC path — `spark.sql.adaptive.skewJoin` (enabled in
session.py) must actually split a skewed partition at runtime, visible
as `skew=true` on the SortMergeJoin in the final adaptive plan. If a
Spark upgrade or conf change silently disables it, a 100 TB hot-key
join degrades from "slow task" to "stuck stage" with no test noticing.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        # make the test dataset look skewed to AQE
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # force the sort-merge path (broadcast would hide the skew logic)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # coalescing first would merge our tiny partitions and mask skew
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # data-dependent payload: survives column pruning (it feeds the
        # final min()) and is incompressible, so the hot partition's
        # shuffle bytes actually exceed the skew threshold
        pad = F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5((F.col("id") + 1).cast("string")),
        ).alias("pad")
        # key 0 carries ~99% of the left side
        left = (
            spark.range(0, 100_000)
            .select(
                F.when(F.col("id") % 100 != 0, F.lit(0))
                .otherwise(F.lit(1) + F.col("id") % 36)
                .alias("k"),
                pad,
            )
        )
        right = (
            spark.range(0, 40)
            .select(F.col("id").alias("k"), F.lit(1).alias("w"))
        )
        # NOTE: no groupBy on the join key afterwards — AQE refuses to
        # split a skewed SMJ whose output partitioning a downstream
        # operator still needs (splitting would break co-partitioning).
        joined = left.join(right, "k").agg(
            F.count("*").alias("n"), F.min("pad").alias("mp")
        )
        row = joined.collect()[0]
        # correctness: the hot key kept every row through the split
        # (99,000 on key 0 + 1,000 spread over keys 1..36)
        assert row["n"] == 100_000 and row["mp"] is not None
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
