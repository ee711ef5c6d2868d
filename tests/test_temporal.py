"""Invariants for the temporal shapes: SCD2 interval structure and the
binned interval join's plan."""

from __future__ import annotations

from bigdatanycdiseasesurveillance_spark.registry import all_specs

SPECS = all_specs()


def test_scd2_intervals_are_contiguous_with_one_current(spark, sf_dir):
    rows = SPECS["scd2_user_type_history"].fn(spark, sf_dir).collect()
    assert rows
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from"])
        # exactly one open-ended current row, and it is the last one
        assert sum(1 for r in ivs if r["is_current"]) == 1
        assert ivs[-1]["valid_to"] is None and ivs[-1]["is_current"]
        # half-open chain: each valid_to == next valid_from
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"], (user, a, b)
        # consecutive intervals always change type (compression worked)
        for a, b in zip(ivs, ivs[1:]):
            assert a["event_type"] != b["event_type"]


def test_interval_join_plan_is_equi_join(spark, sf_dir):
    """The binned interval join must never plan a cross product — the
    bucket key makes it an equi-join with a containment residual."""
    df = SPECS["join_interval_binned"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
