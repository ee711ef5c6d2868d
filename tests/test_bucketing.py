"""Bucketed co-located join: the pay-the-shuffle-once scale strategy.

Pins the whole point of bucketing — a fact⋈fact equi-join on the bucket
key plans a SortMergeJoin with ZERO Exchange on either side — and that
the join result matches the plain (shuffled) join bit-for-bit.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from bigdatanycdiseasesurveillance_spark.plans import executed_plan
from bigdatanycdiseasesurveillance_spark.sources.bucketing import (
    colocated_join,
    drop_bucketed,
    read_bucketed,
    write_bucketed,
)
from bigdatanycdiseasesurveillance_spark.tables import table


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    li_t, o_t = f"li_bkt_{suffix}", f"o_bkt_{suffix}"
    write_bucketed(
        table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        ),
        li_t,
        ["l_orderkey"],
        num_buckets=8,
    )
    write_bucketed(
        table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus"
        ),
        o_t,
        ["o_orderkey"],
        num_buckets=8,
    )
    yield li_t, o_t
    drop_bucketed(spark, li_t)
    drop_bucketed(spark, o_t)


def test_colocated_join_has_no_exchange(spark, bucketed_pair):
    """Same bucket count on both sides -> SortMergeJoin reads bucket i
    against bucket i; any Exchange in the plan means the write-time
    shuffle was wasted."""
    li_t, o_t = bucketed_pair
    # force the join path (no broadcast) so the pin is about bucketing.
    # RESTORE the previous value, never unset: unset falls to Spark's
    # hard 10MB default, not the session factory's 64MB — the leaked
    # threshold then flips broadcast decisions (and Exchange counts)
    # in every later plan-pinning test sharing the session (this
    # exact leak broke the shuffle-budget sweep in the full suite)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = colocated_join(
            spark, li_t, o_t, left_key="l_orderkey", right_key="o_orderkey"
        )
        plan = executed_plan(df)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    """groupBy on the bucket key also reuses the write-time layout —
    the partial/final aggregate runs in one stage per bucket."""
    li_t, _ = bucketed_pair
    df = (
        read_bucketed(spark, li_t)
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"))
    )
    assert "Exchange" not in executed_plan(df)


def test_colocated_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    """The layout optimization must not change results: bucketed join ==
    plain shuffled join on the same inputs."""
    li_t, o_t = bucketed_pair
    got = (
        colocated_join(
            spark, li_t, o_t, left_key="l_orderkey", right_key="o_orderkey"
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
