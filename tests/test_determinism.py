"""Layout-determinism pins for exact-money accumulation (r7 verdict
directive #5).

The r7 sf1 audit caught tpch_q3 flipping one cent BETWEEN RUNS of
identical code: SUM over DOUBLE is summation-order-dependent, and
Spark's order varies with partition layout/scheduling, so a revenue
landing on a half-cent boundary rounds differently run to run. The fix
accumulates money in DECIMAL (order-independent). Oracle equality at a
fixed layout cannot guard that invariant — the bug was LAYOUT-dependent
— so these tests vary the layout explicitly:

1. the failure mechanism is reproduced deterministically with an
   adversarial dataset under the PRE-r7 double formulation (this is the
   test that FAILS on the old code shape);
2. the current DECIMAL formulation is bit-identical on the same
   adversarial layouts;
3. the real tpch_q1 contract output is bit-identical across different
   `spark.sql.shuffle.partitions` / input-repartition layouts.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

# The absorption gadget: at magnitude 1e15 the double grid spacing is
# 0.0625, so adding 0.0025 to 1e15 is a no-op (absorbed), while
# 0.0025 + 0.0025 away from the big value survives. True sum is exactly
# 0.005 — a half-cent boundary — so the two layouts round to different
# cents under double accumulation. Per-partition partial aggregation
# folds rows in partition order; the cross-partition merge is
# order-insensitive for both layouts' partials by construction (0.0 +
# 0.005 and 1e15 + -1e15 commute), so the outcome does not depend on
# task completion order.
BIG = 1.0e15
EPS = 0.0025


def _two_partition_df(spark, part1, part2):
    """A 2-partition DataFrame with EXACT row placement and row order:
    each side is a single-partition LocalRelation, union preserves
    partition boundaries."""
    a = spark.createDataFrame([(v,) for v in part1], "v double").coalesce(1)
    b = spark.createDataFrame([(v,) for v in part2], "v double").coalesce(1)
    return a.union(b)


def _sum_double(df):
    # the pre-r7 formulation: round(sum(double), 2)
    return df.agg(F.round(F.sum("v"), 2).alias("s")).collect()[0]["s"]


def _sum_decimal(df):
    # the shipped formulation (queries/tpch.py _MONEY device), widened
    # to 4dp so the gadget's quarter-cent inputs are represented exactly
    return df.agg(
        F.round(F.sum(F.col("v").cast("decimal(24,4)")), 2).alias("s")
    ).collect()[0]["s"]


def _layouts(spark):
    # layout A: the opposing big values cancel inside one partition, the
    # two quarter-cents meet in the other -> partials (0.0, 0.005)
    la = _two_partition_df(spark, [BIG, -BIG], [EPS, EPS])
    # layout B: the quarter-cents are absorbed next to the big value
    # -> partials (1e15, -1e15)
    lb = _two_partition_df(spark, [BIG, EPS, EPS], [-BIG])
    return la, lb


def test_double_sum_is_layout_dependent(spark):
    """The pre-r7 formulation gives DIFFERENT cents for the same multiset
    of values under two partition layouts — the exact tpch_q3 failure
    mechanism, reproduced deterministically. If the shipped contracts
    ever revert to double sums, the invariant test below is the guard;
    this one proves the mechanism is real (not a vacuous pin)."""
    la, lb = _layouts(spark)
    s_a, s_b = _sum_double(la), _sum_double(lb)
    assert s_a == 0.01, f"cancel-first layout should see the half cent: {s_a}"
    assert s_b == 0.0, f"absorb layout should lose the half cent: {s_b}"
    assert s_a != s_b


def test_decimal_sum_is_layout_invariant(spark):
    """The shipped DECIMAL formulation is exact at any summation order:
    both adversarial layouts produce the identical rounded cent."""
    la, lb = _layouts(spark)
    s_a, s_b = _sum_decimal(la), _sum_decimal(lb)
    assert s_a == s_b == Decimal("0.01")


def test_tpch_q1_bit_identical_across_shuffle_layouts(spark, sf_dir):
    """The real money contract, bit-for-bit stable when the physical
    layout changes: different shuffle fan-out AND different scan split
    sizes (more/fewer partial-aggregation buckets) must not move any
    output double by even one ulp. This is the invariant that actually
    failed in r7 — oracle equality at one fixed layout could not see
    it."""
    from bigdatanycdiseasesurveillance_spark.queries.tpch import (
        tpch_q1_pricing_summary,
    )

    def run(shuffle_parts, max_part_bytes):
        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", shuffle_parts)
            spark.conf.set("spark.sql.files.maxPartitionBytes", max_part_bytes)
            rows = tpch_q1_pricing_summary(spark, sf_dir).collect()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
            spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        return sorted(tuple(r) for r in rows)

    wide = run("32", str(128 * 1024 * 1024))
    narrow = run("2", str(64 * 1024))  # many tiny scan splits, 2 reducers
    assert len(wide) > 0
    # repr-level equality: 1-ulp float drift would show here
    assert [repr(r) for r in wide] == [repr(r) for r in narrow]
