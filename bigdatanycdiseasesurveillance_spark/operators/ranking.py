"""Bucketed global ranking — the scale rewrite of single-partition
window functions (SURVEY §2.5 W-family, reference analogue: the global
ORDER BY rankings the reference computes driver-side in
`app_upgraded.py` dashboard queries).

`row_number() OVER (ORDER BY k)` and `SUM(x) OVER (ORDER BY k ROWS
UNBOUNDED PRECEDING)` plan as `Exchange SinglePartition` + `Window` —
every row of the input funnels through ONE task, which is the canonical
100 TB scale-killer (`WindowExec: No Partition Defined`). The rewrite,
proven value-identical to the naive form by the win_global_rank_ranged
/ cur_perplexity_buckets / dedup_cross_source_snm oracles:

1. bucket rows by a COARSE key that is a non-decreasing function of the
   leading sort key (day(ts), floor(value), nll*10 bands, id ranges);
2. aggregate one count/sum per bucket (a map-side-combinable shuffle on
   the bucket key);
3. prefix-sum the per-bucket totals into offsets;
4. broadcast the offsets back and add each row's LOCAL rank / running
   sum within its bucket (a window partitioned by the bucket key).

Equal to the single-partition form by construction: within a bucket the
local window applies the same total order, and the offset is exactly
the number of rows (sum of values) in all earlier buckets.

Step 3 runs on the CONTROL PLANE: the per-bucket totals are collected
(bucket cardinality is corpus-size independent — day/band/value-range
grain, capped loudly at 1M), prefix-summed in Python, and shipped back
as a broadcast literal dim. This is the same bounded-collect contract
as lloyd_kmeans_nd's k centroid rows and connected_components'
convergence probes, and it keeps the final plan free of ANY
unpartitioned WindowExec — the lazy alternative (a window over the
bucket-count frame, as cur_perplexity_buckets does in-plan) is equal in
value but leaves a bucket-frame global window in the plan and, when
chained (RFM ranks three dimensions back to back), re-plans the
upstream subtree once per consumer.

The bucket key contract: for ranks, `bucket` must be non-decreasing
along `order_cols`' total order (any coarsening of the leading key
qualifies — ties across a boundary are impossible because equal order
keys get equal bucket keys); for running sums, the same, with the sum
taken over the identical order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_B = "__rk_bucket"
_LOCAL = "__rk_local"
_OFF = "__rk_offset"

MAX_BUCKETS = 1_000_000  # loud failure beats a silent driver OOM


def _offset_dim(bucketed: DataFrame, agg: Column):
    """Collect per-bucket totals (bounded: bucket-key cardinality),
    prefix-sum driver-side, return (broadcast offsets frame, grand
    total). One bounded control-plane job; the caller's plan joins a
    LocalTableScan literal dim."""
    rows = bucketed.groupBy(_B).agg(agg.cast("long").alias("__bn")).collect()
    if len(rows) > MAX_BUCKETS:
        raise ValueError(
            f"bucketed rank: {len(rows)} buckets exceeds MAX_BUCKETS="
            f"{MAX_BUCKETS}; pick a coarser bucket key"
        )
    rows.sort(key=lambda r: r[_B])
    offsets, acc = [], 0
    for r in rows:
        offsets.append((r[_B], acc))
        acc += r["__bn"] or 0
    spark = bucketed.sparkSession
    btype = bucketed.schema[_B].dataType.simpleString()
    dim = spark.createDataFrame(offsets, f"{_B} {btype}, {_OFF} long")
    return F.broadcast(dim), acc


def bucketed_global_rank(
    df: DataFrame,
    bucket: Column,
    order_cols: list,
    rank_col: str = "rn",
    total_col: str | None = None,
) -> DataFrame:
    """df + `rank_col` = row_number() OVER (ORDER BY *order_cols), and
    optionally `total_col` = COUNT(*) OVER () — computed without any
    single-partition window. `bucket` must be a non-decreasing function
    of the order (see module docstring)."""
    wd = df.withColumn(_B, bucket)
    dim, total = _offset_dim(wd, F.count("*"))
    wlocal = Window.partitionBy(_B).orderBy(*order_cols)
    out = (
        wd.withColumn(_LOCAL, F.row_number().over(wlocal))
        .join(dim, _B)
        .withColumn(rank_col, (F.col(_OFF) + F.col(_LOCAL)).cast("long"))
        .drop(_B, _LOCAL, _OFF)
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(total).cast("long"))
    return out


def bucketed_running_sum(
    df: DataFrame,
    bucket: Column,
    order_cols: list,
    sum_col: str,
    out_col: str = "running_sum",
) -> DataFrame:
    """df + `out_col` = SUM(sum_col) OVER (ORDER BY *order_cols ROWS
    UNBOUNDED PRECEDING) — inclusive running total, no single-partition
    window. Same bucket-key contract as bucketed_global_rank."""
    wd = df.withColumn(_B, bucket)
    dim, _ = _offset_dim(wd, F.sum(sum_col))
    wlocal = (
        Window.partitionBy(_B)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        wd.withColumn(_LOCAL, F.sum(sum_col).over(wlocal))
        .join(dim, _B)
        .withColumn(out_col, (F.col(_OFF) + F.col(_LOCAL)).cast("long"))
        .drop(_B, _LOCAL, _OFF)
    )


def ntile_from_rank(rank_sql: str, n_sql: str, k: int) -> Column:
    """SQL NTILE(k) recomputed from a global rank in TRUE integer
    arithmetic (`div`, never float division — IEEE rounding can flip a
    bucket boundary past 2^53): the first n%k tiles get n div k + 1
    rows, the rest n div k — exactly Spark's and DuckDB's NTILE
    contract. With rn 1-based and q = n div k, r = n mod k: rows at
    rn <= (q+1)*r sit in the (q+1)-sized tiles; later rows in q-sized
    tiles (the q=0 degenerate case never reaches the ELSE branch
    because the cut then equals n). Takes SQL fragments so the whole
    expression stays in integer `div`."""
    q = f"(({n_sql}) div {k})"
    r = f"(({n_sql}) % {k})"
    cut = f"(({q} + 1) * {r})"
    return F.expr(
        f"CAST(CASE WHEN ({rank_sql}) <= {cut}"
        f" THEN (({rank_sql}) - 1) div ({q} + 1) + 1"
        f" ELSE {r} + (({rank_sql}) - {cut} - 1) div {q} + 1 END AS BIGINT)"
    )
