"""Invariants and plan pins for the quality / maintenance / text-feature
/ edit-similarity modules (oracle parity itself runs in
test_oracle_parity.py via the registry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatanycdiseasesurveillance_spark.registry import all_specs
from bigdatanycdiseasesurveillance_spark.tables import table

SPECS = all_specs()


def test_dq_expectations_clean_data_all_pass(spark, sf_dir):
    rows = SPECS["dq_expectations"].fn(spark, sf_dir).collect()
    assert len(rows) == 6
    assert all(r["passed"] for r in rows), rows
    assert all(0.0 <= r["metric"] <= 1.0 for r in rows)


def test_quantile_bins_partition_all_orders(spark, sf_dir):
    rows = {r["bin"]: r for r in SPECS["feat_quantile_binning"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"q1", "q2", "q3", "q4"}
    total = table(spark, sf_dir, "orders").count()
    assert sum(r["n_orders"] for r in rows.values()) == total
    # bins are ordered intervals: each bin's max <= next bin's min
    for lo, hi in [("q1", "q2"), ("q2", "q3"), ("q3", "q4")]:
        assert rows[lo]["max_price"] <= rows[hi]["min_price"]
    # roughly a quarter each (exact-cutpoint binning, ties allowed)
    for r in rows.values():
        assert r["n_orders"] >= total * 0.15


def test_cdc_apply_drops_deleted_keys(spark, sf_dir):
    """A user whose final change is a delete must vanish; everyone else
    surfaces exactly once with their latest update."""
    snap = SPECS["cdc_apply_changes"].fn(spark, sf_dir)
    assert snap.groupBy("user_id").count().filter("count > 1").count() == 0
    e = table(spark, sf_dir, "events")
    last = (
        e.withColumn("op", F.when(F.col("event_id") % 10 == 0, "D").otherwise("U"))
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .groupBy("user_id")
        .agg(F.first("op").alias("last_op"))
    )
    deleted = {r["user_id"] for r in last.filter("last_op = 'D'").collect()}
    kept = {r["user_id"] for r in snap.select("user_id").collect()}
    assert kept.isdisjoint(deleted)
    n_users = e.select("user_id").distinct().count()
    assert len(kept) == n_users - len(deleted)


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    """The partial-merge algebra must be lossless vs one-shot agg."""
    merged = {
        r["event_type"]: r
        for r in SPECS["agg_incremental_merge"].fn(spark, sf_dir).collect()
    }
    direct = {
        r["event_type"]: r
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for t, d in direct.items():
        m = merged[t]
        assert m["n_events"] == d["n_events"]
        assert abs(m["sum_value"] - d["sum_value"]) < 1e-6
        assert m["min_value"] == d["min_value"]
        assert m["max_value"] == d["max_value"]


def test_dup_representative_covers_corpus(spark, sf_dir):
    reps = SPECS["cur_dup_representative"].fn(spark, sf_dir)
    rows = reps.collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r["n_copies"] for r in rows) == n_docs
    ids = [r["kept_doc_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_hamming_blocking_is_lossless(spark, sf_dir):
    """Masked-neighborhood blocking must reproduce the brute-force
    same-length theta join exactly (mask sets cover every <=2-position
    mismatch pattern)."""
    got = {
        (r["hamming_d"], r["n_pairs"])
        for r in SPECS["dedup_hamming_pairs"].fn(spark, sf_dir).collect()
    }
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    a = c.select(F.col("id").alias("ai"), F.col("name").alias("an"))
    b = c.select(F.col("id").alias("bi"), F.col("name").alias("bn"))
    d = F.expr(
        "aggregate(sequence(1, length(an)), 0, (acc, i) -> acc +"
        " CASE WHEN substring(an, i, 1) = substring(bn, i, 1) THEN 0 ELSE 1 END)"
    )
    brute = {
        (r["d"], r["n"])
        for r in a.join(b, (F.length("an") == F.length("bn")) & (F.col("ai") < F.col("bi")))
        .withColumn("d", d)
        .filter(F.col("d").between(1, 2))
        .groupBy(F.col("d").cast("long").alias("d"))
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    }
    assert got == brute and got


def test_hamming_join_plan_has_no_cartesian(spark, sf_dir):
    plan = (
        SPECS["dedup_hamming_pairs"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """E-S sampling with weight = n_chars must skew the sample's mean
    weight above the corpus mean (inclusion prob proportional to w)."""
    sample = SPECS["sample_weighted_topk"].fn(spark, sf_dir).collect()
    assert len(sample) == 100
    docs = table(spark, sf_dir, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(r["weight"] for r in sample) / len(sample)
    assert sample_mean > corpus_mean
    # keys are valid: ln(u)/w is strictly negative
    assert all(r["sample_key"] < 0 for r in sample)


def test_tfidf_top_terms_shape(spark, sf_dir):
    rows = SPECS["txt_tfidf_top_terms"].fn(spark, sf_dir).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    n_sources = (
        table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    assert len(by_src) == n_sources
    for terms in by_src.values():
        assert 1 <= len(terms) <= 5
        assert len({t["term"] for t in terms}) == len(terms)


def test_ewma_bounds_and_first_day_identity(spark, sf_dir):
    """Day-0 EWMA equals that day's count (frame holds only itself);
    every EWMA lies within the trailing window's [min, max] counts."""
    rows = SPECS["win_ewma_smooth"].fn(spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r["day"])
        assert abs(series[0]["ewma"] - series[0]["n_events"]) < 1e-6
        for i, r in enumerate(series):
            window = [s["n_events"] for s in series[max(0, i - 13) : i + 1]]
            assert min(window) - 1e-6 <= r["ewma"] <= max(window) + 1e-6


def test_full_pipeline_stages_are_monotone(spark, sf_dir):
    """Each curation stage can only shrink the corpus, in both docs
    and token mass; stage labels are complete and ordered."""
    rows = {r["stage"]: r for r in SPECS["cur_full_pipeline"].fn(spark, sf_dir).collect()}
    order = [
        "stage0_corpus",
        "stage1_dedup",
        "stage2_quality",
        "stage3_decontam",
        "stage4_domain_cap",
        "stage5_token_budget",
    ]
    assert set(rows) == set(order)
    for a, b in zip(order, order[1:]):
        assert rows[b]["n_docs"] <= rows[a]["n_docs"], (a, b)
        assert rows[b]["n_tokens"] <= rows[a]["n_tokens"], (a, b)
    assert rows["stage5_token_budget"]["n_docs"] > 0
