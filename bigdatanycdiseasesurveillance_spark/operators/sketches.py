"""Frequency sketches: distributed Misra-Gries heavy hitters.

Two-pass design that makes a sketch result EXACT (and therefore
driver-oracle-able):

1. candidate pass — per-partition Misra-Gries summaries with
   k = ceil(1/phi) counters, maintained across the partition's Arrow
   batches inside one mapInPandas closure. Pigeonhole guarantee: any
   item with global frequency > n/k exceeds n_p/k in at least one
   partition, so the union of partition summaries is a SUPERSET of the
   true heavy hitters. Summary size is k items per partition — fixed,
   tiny — regardless of data volume.
2. exact pass — count ONLY the candidates (left-semi join) and apply
   the threshold in exact integer arithmetic (cnt * denom > total).

At 100 TB: pass 1 is a full scan with O(k) state per task and O(k x
partitions) rows emitted; pass 2 aggregates a vocabulary-sized set.
The full groupBy-every-token shuffle never happens for the skewed
long tail — exactly the reason to sketch.

The mapInPandas function is a closure (pickle-by-value): executors do
not have this repo on sys.path under the round driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned and deduped.
    `items` is a one-column frame of occurrences (pre-exploded).
    Returns a DataFrame of candidate values (column name preserved)."""

    def mg(batches):
        import pandas as _pd

        counters: dict = {}
        for pdf in batches:
            for v in pdf.iloc[:, 0]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [u for u in counters if counters[u] == 1]
                    for u in dead:
                        del counters[u]
                    for u in counters:
                        counters[u] -= 1
        yield _pd.DataFrame({col: list(counters.keys())})

    from ..tables import parallelize_scan

    # pass 1 is Python-per-item; more partitions only ENLARGE the
    # candidate superset (k per partition), never lose a heavy hitter,
    # and pass 2 recounts exactly — so the rebalance is result-safe
    return parallelize_scan(items).mapInPandas(mg, schema=f"{col} string").distinct()


def heavy_hitters_exact(
    items: DataFrame, col: str, denom: int
) -> DataFrame:
    """Items with frequency strictly greater than total/denom, exactly:
    Misra-Gries candidates (k = denom counters) then an exact count of
    candidates only. Returns (col, cnt) gated in integer arithmetic."""
    k = int(math.ceil(denom))
    cand = misra_gries_candidates(items, col, k)
    total = items.count()  # scalar; one job, no per-row driver work
    return (
        items.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") * denom > F.lit(total))
    )


# --- count-min sketch (md5-replayable, mergeable) ----------------------


def cms_bucket(col, d: int, width: int):
    """CMS bucket for depth row ``d``: md5-derived 60-bit hash mod width.
    SQL twin: CAST(('0x'||substr(md5('cms:{d}:'||x),1,15)) AS BIGINT) %
    width — DuckDB reproduces it bit-for-bit, so sketches built here are
    oracle-checkable exactly (same family as minhash_md5_pairs)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"cms:{d}:"), col)), 1, 15), 16, 10)
    return h.cast("long") % width


def cms_table(items: DataFrame, col: str, width: int = 32, depth: int = 4) -> DataFrame:
    """Count-min sketch in relational form: one row per (d, bucket) with
    its counter. Mergeable: the sketch of a union of corpora is SUM(cnt)
    grouped by (d, bucket) over the per-corpus sketches — the same
    re-aggregable-partials contract as the HLL partials query.

    Scale shape: one scan; the shuffle carries at most depth x width
    rows per map task (map-side combine), never the raw items — this is
    the whole point of sketching a 100 TB column whose exact groupBy
    would shuffle billions of distinct keys.
    """
    v = F.col(col).cast("string")
    buckets = items.select(
        *[cms_bucket(v, d, width).alias(f"b{d}") for d in range(depth)]
    )
    stacked = buckets.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("d"),
                        F.col(f"b{d}").alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s")
    ).select("s.d", "s.bucket")
    return stacked.groupBy("d", "bucket").agg(F.count("*").cast("long").alias("cnt"))


def cms_estimates(
    queries: DataFrame, col: str, cms: DataFrame, width: int = 32, depth: int = 4
) -> DataFrame:
    """Point-query estimates against a built sketch: est(x) = min over
    depth rows of counter[d][bucket_d(x)] (0 when a bucket is absent —
    only possible for items outside the sketched corpus). The sketch is
    depth x width rows, so the join broadcasts; query volume streams."""
    v = F.col(col).cast("string")
    qb = queries.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("d"),
                        cms_bucket(v, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s"),
    ).select(col, "s.d", "s.bucket")
    return (
        qb.join(F.broadcast(cms), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_est"))
    )
