"""Bucketed (pre-shuffled) tables for co-located fact-fact joins.

At 100 TB the dominant cost of a repeated fact⋈fact join (lineitem ⋈
orders on orderkey, events ⋈ events on user_id, ...) is the shuffle of
both sides on every query. Bucketing pays that shuffle ONCE at write
time: `bucketBy(n, key)` hash-partitions rows into n files per write
task and records the layout in the catalog, so every later equi-join or
aggregation on the bucket key reads co-located partitions and plans a
SortMergeJoin with ZERO Exchange on either side (pinned in
tests/test_bucketing.py).

Sizing rule for the real cluster: pick `num_buckets` so one bucket of
the LARGER table is ~100-200 MB compressed (e.g. 100 TB / 128 MB ≈ 800k
buckets is too many files — bucket the curated gold layer, not raw
ingest, and combine with date partitioning so a bucket-day is the read
unit). Both sides of an intended join MUST use the same bucket count,
or Spark re-shuffles the mismatched side.

reference: the engine this replaces persists joined views per query
(src/database/postgres_client.py re-reads + re-joins each dashboard
load); bucketing is the Spark-native equivalent of its precomputed
join tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed by ``bucket_cols``.

    ``sort_cols`` (default: the bucket columns) sorts rows inside each
    bucket file so a later SortMergeJoin can skip its Sort when Spark
    can prove one file per bucket.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the bucketing
    metadata only survives the catalog path — ``spark.read.parquet`` on
    the files would lose it and re-shuffle on join)."""
    return spark.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | None = None,
    left_key: str | None = None,
    right_key: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys.

    With both sides bucketed on the join key and
    ``spark.sql.sources.bucketing.enabled`` (default true), the planned
    SortMergeJoin has no Exchange: each task merges bucket i of the
    left with bucket i of the right.
    """
    left = read_bucketed(spark, left_table)
    right = read_bucketed(spark, right_table)
    if on is not None:
        return left.join(right, on=on, how=how)
    return left.join(right, left[left_key] == right[right_key], how)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
