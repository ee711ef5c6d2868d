"""Round-11 registry additions: semantic invariants beyond the
oracle-parity gate (the gate proves engine==DuckDB; these pin the
properties that make each operator CORRECT, so a bug that breaks both
engines identically still turns red)."""

from __future__ import annotations

from bigdatanycdiseasesurveillance_spark.registry import all_specs

SPECS = all_specs()


def test_theta_sketch_invariants(spark, sf_dir):
    rows = SPECS["win_theta_sketch_partial"].fn(spark, sf_dir).collect()
    assert len(rows) == 20  # 5 types, ordered pairs
    by_a = {}
    for r in rows:
        # KMV partial-merge must equal the direct sketch EXACTLY
        assert r["merge_exact_a"] is True
        by_a.setdefault(r["type_a"], set()).add(r["est_users_a"])
        # a-not-b estimate can never exceed the a estimate's support
        assert r["est_a_not_b"] >= 0.0
    # est_users_a is a property of type_a alone — identical on every
    # row that shares it
    assert all(len(v) == 1 for v in by_a.values())
    # at sf0.001 every type has < k=64 users -> exact mode: estimates
    # ARE the exact distinct counts (true countDistinct, not approx)
    if sf_dir.endswith("sf0.001"):
        from pyspark.sql import functions as F

        exact = {
            r["event_type"]: r["n"]
            for r in spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        for t, ests in by_a.items():
            est = next(iter(ests))
            assert est == float(exact[t]), (t, est, exact[t])


def test_contamination_profile_monotone(spark, sf_dir):
    rows = sorted(
        SPECS["cur_contamination_ngram_overlap"].fn(spark, sf_dir).collect(),
        key=lambda r: r["threshold"],
    )
    assert [r["threshold"] for r in rows] == [0.0, 0.2, 0.4, 0.6, 0.8]
    n_docs = {r["n_train_docs"] for r in rows}
    assert len(n_docs) == 1  # denominator is the same train split
    flagged = [r["n_flagged"] for r in rows]
    # threshold 0.0 flags every scored doc; higher cuts flag fewer
    assert flagged[0] == rows[0]["n_train_docs"]
    assert flagged == sorted(flagged, reverse=True)
    for r in rows:
        assert 0.0 <= r["flag_rate"] <= 1.0


def test_stl_components_reassemble(spark, sf_dir):
    rows = SPECS["ts_stl_decompose"].fn(spark, sf_dir).collect()
    per_type = {}
    for r in rows:
        per_type.setdefault(r["event_type"], []).append(r)
        if r["trend"] is not None and r["seasonal"] is not None:
            # additive contract: components reassemble the series
            # (each component rounded to 6, so the sum is within 2e-6)
            assert (
                abs(r["cnt"] - (r["trend"] + r["seasonal"] + r["residual"]))
                < 2e-6
            ), r
        else:
            assert r["residual"] is None
    for t, rs in per_type.items():
        rs.sort(key=lambda r: r["day"])
        n_edge = sum(1 for r in rs if r["trend"] is None)
        # a centered 7-row frame leaves exactly 3 nulls at each end
        # (when the series is longer than 6 observations)
        if len(rs) > 6:
            assert n_edge == 6, (t, n_edge)
            assert all(r["trend"] is None for r in rs[:3] + rs[-3:])


def test_bloom_filter_no_false_negatives(spark, sf_dir):
    rows = SPECS["sketch_bloom_join_prune"].fn(spark, sf_dir).collect()
    assert len(rows) == 4  # every non-purchase type
    for r in rows:
        # the Bloom guarantee: every true member passes, so the pass
        # set decomposes exactly into members + false positives
        assert r["n_pass_filter"] == r["n_true_members"] + r["n_false_positives"], r
        assert r["merge_exact"] is True
        if r["false_positive_rate"] is not None:
            assert 0.0 <= r["false_positive_rate"] <= 1.0
