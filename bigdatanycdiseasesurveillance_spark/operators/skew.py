"""Skew mitigation (SURVEY §4 / 100 TB notes).

AQE's skew-join splitting handles sort-merge skew at runtime, but two
patterns still need explicit salting at scale:

- joining a huge fact against a small-but-not-broadcastable table when
  a handful of keys dominate the fact side;
- per-key state that must stay bounded (e.g. collect_list on a hot key).

`salted_join` replicates the right side SALT ways and scatters the left
side's hot keys uniformly across the replicas, so one hot key occupies
SALT shuffle partitions instead of one. Deterministic: the salt comes
from a hash of stable columns, not rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    left_salt_from: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `left.on == right.on` with SALT-way key splitting.

    The left side gets a deterministic salt in [0, salt) hashed from
    `left_salt_from` (defaults to all left columns — any stable unique-ish
    column set works); the right side is exploded SALT ways. Result
    equals the plain join, but each (key, salt) shuffle bucket carries
    ~1/salt of a hot key's rows.
    """
    salt_cols = left_salt_from or left.columns
    lhs = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt)).cast("int")
    )
    rhs = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lhs.join(rhs, [on, "__salt"], how)
    return out.drop("__salt")


def salted_count(df: DataFrame, key: Column, salt: int = 16, cnt_alias: str = "cnt") -> DataFrame:
    """Two-phase count for a skewed key: partial count per (key, salt)
    then final sum per key. Spark's hash aggregate already does map-side
    partials; this form additionally bounds the FINAL-stage bucket for a
    hot key, which matters when the reduce side applies per-key logic
    heavier than sum (sketches, collect_list caps)."""
    salted = df.groupBy(
        key.alias("__k"), F.spark_partition_id().alias("__salt")
    ).agg(F.count("*").alias("__partial"))
    return (
        salted.groupBy("__k")
        .agg(F.sum("__partial").cast("long").alias(cnt_alias))
        .withColumnRenamed("__k", "key")
    )
