"""Mergeable-sketch maintenance and rolling robust statistics: the
Datasketches HLL partial-merge path (the sketch analog of
agg_incremental_merge's exact partial algebra) and an exact rolling
median.

Scale notes: hll_sketch_agg produces a FIXED-SIZE mergeable state per
group — the property that lets a 100 TB pipeline maintain distinct
counts per day and union them into arbitrary ranges without ever
re-scanning raw keys (re-aggregable distincts, which plain
approx_count_distinct cannot do across pre-aggregated partitions).
The rolling median is a 7-row frame over the pre-aggregated daily
series: per-frame sort of <= 7 values, no corpus-side cost.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table


@register(
    "agg_hll_partial_merge",
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS merge_equals_direct,
               TRUE AS estimate_within_5pct
        FROM events GROUP BY event_type
    """,
    tags=("sketch", "hll", "incremental"),
)
def agg_hll_partial_merge(spark, sf_dir):
    """Re-aggregable distinct counting: build one HLL sketch per
    (event_type, day) partial, union the partials per type, and
    estimate — next to the direct whole-column sketch estimate and the
    exact distinct. The merge-equals-direct identity (sketch union is
    lossless over the same stream) is the contract that lets daily
    sketch partials serve any date-range distinct query at 100 TB with
    zero raw re-scan. Datasketches state has no DuckDB twin, so the
    driver-checkable row is self-verifying: the (oracle-able) exact
    count plus both contract booleans, which the oracle pins TRUE —
    a sketch/merge regression flips the row red. Raw estimates stay
    pinned in tests/test_basket.py."""
    e = table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("date")
    )
    partials = e.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = partials.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate")
    )
    direct = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_estimate"),
        F.countDistinct("user_id").cast("long").alias("exact_users"),
    )
    return merged.join(direct, "event_type").select(
        "event_type",
        "exact_users",
        (F.col("merged_estimate") == F.col("direct_estimate")).alias(
            "merge_equals_direct"
        ),
        (
            F.abs(F.col("direct_estimate") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("estimate_within_5pct"),
    )


@register(
    "win_rolling_median",
    oracle="""
        WITH s AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS day,
                   COUNT(*) AS cnt
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
               median(cnt) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                   AS med7
        FROM s
    """,
    tags=("window", "median", "robust"),
)
def win_rolling_median(spark, sf_dir):
    """Exact rolling 7-observation median of the daily volume per type
    — the robust companion to win_rolling_7d's mean (a single spike
    day moves the mean, not the median). Spark has no windowed median,
    so the frame is collected (<= 7 values) and the median computed
    with array_sort + middle element(s), interpolating even frames
    exactly like DuckDB's quantile_cont(0.5): integer counts make the
    half-interpolated values exactly representable, so both engines
    emit identical doubles."""
    e = table(spark, sf_dir, "events")
    s = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    arr = F.array_sort(F.collect_list("cnt").over(w))
    n = F.size(arr)
    med = F.when(
        n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int")).cast("double")
    ).otherwise(
        (
            F.element_at(arr, (n / 2).cast("int"))
            + F.element_at(arr, (n / 2).cast("int") + 1)
        )
        / 2.0
    )
    return s.select(
        "event_type",
        "day",
        F.col("cnt").cast("long").alias("cnt"),
        med.alias("med7"),
    )
