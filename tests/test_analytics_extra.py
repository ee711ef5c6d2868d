"""Invariants and plan pins for the graph / analytics-extras modules
(oracle parity runs in test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatanycdiseasesurveillance_spark.registry import all_specs
from bigdatanycdiseasesurveillance_spark.tables import table

SPECS = all_specs()


def test_triangle_count_nontrivial_and_bounded(spark, sf_dir):
    r = SPECS["graph_triangle_count"].fn(spark, sf_dir).collect()[0]
    assert r["n_edges"] > 0 and r["n_vertices"] > 0
    assert r["n_triangles"] > 0  # co-purchase graph is dense enough
    assert 0.0 <= r["global_clustering"] <= 1.0
    assert r["n_wedges"] >= r["n_triangles"] * 3


def test_triangle_plan_has_no_cartesian(spark, sf_dir):
    plan = (
        SPECS["graph_triangle_count"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan


def test_holt_initialization_and_smoothing(spark, sf_dir):
    rows = SPECS["ts_holt_linear"].fn(spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r["day"])
        assert abs(series[0]["level"] - series[0]["n_events"]) < 1e-9
        assert abs(
            series[0]["trend"] - (series[1]["n_events"] - series[0]["n_events"])
        ) < 1e-9
        # level stays within the series' envelope (smoothing, not extrapolation)
        xs = [r["n_events"] for r in series]
        for r in series:
            assert min(xs) - abs(series[0]["trend"]) - 1 <= r["level"] <= max(xs) + abs(series[0]["trend"]) + 1


def test_cumulative_distinct_is_monotone_and_total(spark, sf_dir):
    rows = sorted(
        SPECS["win_cumulative_distinct"].fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    total = (
        table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert rows[-1]["cum_distinct_users"] == total
    prev = 0
    for r in rows:
        assert r["cum_distinct_users"] == prev + r["n_new_users"]
        prev = r["cum_distinct_users"]


def test_rank_suite_bounds(spark, sf_dir):
    rows = SPECS["win_rank_suite"].fn(spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for series in by_type.values():
        n = len(series)
        assert {r["rnk"] for r in series} <= set(range(1, n + 1))
        assert all(0.0 <= r["pct_rank"] <= 1.0 for r in series)
        assert all(0.0 < r["cdist"] <= 1.0 for r in series)
        sizes = {}
        for r in series:
            sizes[r["quartile"]] = sizes.get(r["quartile"], 0) + 1
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1


def test_grouping_sets_grains_reconcile(spark, sf_dir):
    rows = SPECS["agg_grouping_sets"].fn(spark, sf_dir).collect()
    total = table(spark, sf_dir, "events").count()
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1 and grand[0]["n_events"] == total
    by_type = sum(r["n_events"] for r in rows if r["gid"] == 1)
    by_dow = sum(r["n_events"] for r in rows if r["gid"] == 2)
    assert by_type == total and by_dow == total


def test_label_centroids_geometry(spark, sf_dir):
    rows = SPECS["emb_label_centroids"].fn(spark, sf_dir).collect()
    n_total = table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n_total
    for r in rows:
        assert -1.0 - 1e-9 <= r["cos_to_global"] <= 1.0 + 1e-9
        assert r["centroid_norm"] >= 0.0


def test_weighted_sum_window_collapses_to_one_window_node(spark, sf_dir):
    """rank-suite's five ranking functions share one window spec: the
    optimized plan must contain exactly one Window operator."""
    plan = (
        SPECS["win_rank_suite"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Window ") <= 1 or plan.count("\nWindow") <= 1, plan


def test_funnel_is_monotone_nonincreasing(spark, sf_dir):
    rows = {r["stage"]: r["n_users"] for r in SPECS["funnel_stage_counts"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"stage1_view", "stage2_click", "stage3_purchase"}
    assert rows["stage1_view"] >= rows["stage2_click"] >= rows["stage3_purchase"]
    assert rows["stage1_view"] > 0


def test_cohort_offset_zero_has_full_retention(spark, sf_dir):
    rows = SPECS["agg_cohort_retention"].fn(spark, sf_dir).collect()
    zero = [r for r in rows if r["week_offset"] == 0]
    assert zero
    for r in zero:
        # every cohort member is active in their first-touch week
        assert r["n_active"] == r["cohort_size"]
        assert abs(r["retention_frac"] - 1.0) < 1e-12
    for r in rows:
        assert 0.0 < r["retention_frac"] <= 1.0
        assert r["week_offset"] >= 0


def test_value_suite_matches_sorted_series(spark, sf_dir):
    rows = SPECS["win_value_suite"].fn(spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r["day"])
        first, last = series[0]["cnt"], series[-1]["cnt"]
        third = series[2]["cnt"] if len(series) >= 3 else None
        for r in series:
            assert r["first_cnt"] == first
            assert r["last_cnt"] == last
            assert r["third_cnt"] == third
            assert r["delta_from_first"] == r["cnt"] - first
