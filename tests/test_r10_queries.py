"""Edge-input unit tests for the round-10 operator additions — cases
the sf fixtures can't reach (empty docs, known tiny clusters, window
candidate bounds). Value parity at corpus scale is the driver oracle's
job; these pin behavior on degenerate inputs."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_gopher_rules_empty_and_tiny_docs(spark, sf_dir, monkeypatch):
    """Empty/whitespace docs must flow through every rule (n_words = 0
    fails the guards, never NaNs or crashes) and pass counts must be
    exact on a hand corpus."""
    from bigdatanycdiseasesurveillance_spark.queries.curation_q import (
        cur_gopher_rules,
    )
    import bigdatanycdiseasesurveillance_spark.queries.curation_q as CQ

    rows = [
        (1, ""),                      # empty -> every guarded rule fails
        (2, "   "),                   # whitespace-only -> same
        (3, "the " * 30 + "a " * 30),  # 60 words, repetitive (the: 30/60)
        (4, " ".join(f"w{i}" for i in range(60)) + " the a"),  # diverse
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(CQ, "table", lambda _s, _d, _n: df)
    out = {r["rule"]: (r["n_pass"], r["n_fail"]) for r in
           cur_gopher_rules(spark, sf_dir).collect()}
    assert set(out) == {
        "min_words", "max_words", "mean_word_len", "stopword_floor",
        "repetition_cap", "uniq_floor",
    }
    assert all(p + f == 4 for p, f in out.values())
    # doc 3+4 have >= 50 words; 1+2 have zero
    assert out["min_words"] == (2, 2)
    # nothing here approaches the 100k upper gate
    assert out["max_words"] == (4, 0)
    # repetition: doc 3 most-common token is 30/60 > 20% -> fail;
    # doc 4 max count 1/62 -> pass; empty docs fail the word-count
    # gate the expensive expression is now guarded behind (r11 #2)
    assert out["repetition_cap"] == (1, 3)
    # stopwords: doc 3 has 60, doc 4 has 2 -> both pass
    assert out["stopword_floor"] == (2, 2)


def test_lloyd_kmeans_nd_known_clusters(spark):
    """Two well-separated 4-d blobs, k=2: every point must land with
    its blob and the final centroids must be the blob means."""
    from bigdatanycdiseasesurveillance_spark.operators.clustering import (
        lloyd_kmeans_nd,
    )

    blob_a = [(i, 0.0 + i * 0.01, 0.0, 0.0, 0.0) for i in range(4)]
    blob_b = [(10 + i, 5.0 + i * 0.01, 5.0, 5.0, 5.0) for i in range(4)]
    pts = spark.createDataFrame(
        blob_a + blob_b, "pid long, e0 double, e1 double, e2 double, e3 double"
    )
    assigned, centroids = lloyd_kmeans_nd(
        pts, ["e0", "e1", "e2", "e3"], k=2, iters=3, id_col="pid"
    )
    got = {r["pid"]: r["cluster_id"] for r in assigned.collect()}
    a_labels = {got[i] for i in range(4)}
    b_labels = {got[10 + i] for i in range(4)}
    assert len(a_labels) == 1 and len(b_labels) == 1 and a_labels != b_labels
    cent = dict(centroids)
    assert any(abs(v[1]) < 0.1 for v in cent.values())      # blob A y=0
    assert any(abs(v[1] - 5.0) < 0.1 for v in cent.values())  # blob B y=5


def test_sorted_neighborhood_window_bound_and_adjacency(spark, sf_dir, monkeypatch):
    """SNM emits at most (w-1) x n candidate pairs, and two docs whose
    normalized texts share a 12-char prefix and are Jaccard-identical
    must pair."""
    from bigdatanycdiseasesurveillance_spark.queries import dedup_q as DQ

    rows = [
        (1, "influenza outbreak in queens reported today", "s"),
        (2, "influenza outbreak in queens reported today", "s"),  # dup of 1
        (3, "zebra totally unrelated content words here", "s"),
        (4, "measles cases rising in brooklyn schools", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    monkeypatch.setattr(DQ, "table", lambda _s, _d, _n: df)
    out = DQ.dedup_sorted_neighborhood(spark, sf_dir).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert pairs.get((1, 2)) == 1.0
    assert all(j >= 0.7 for j in pairs.values())
    # candidate bound: w-1 = 3 neighbors per doc max
    assert len(pairs) <= 3 * len(rows)


def test_dsir_weights_direction(spark, sf_dir, monkeypatch):
    """DSIR importance weights must rank target-like documents above
    off-target ones: docs sharing the seed source's bigrams get higher
    log-weights."""
    from bigdatanycdiseasesurveillance_spark.queries import lm_q as LQ

    target_text = "clean reference prose sentence "
    rows = (
        [(i, target_text * 5, "src0") for i in range(6)]
        + [(10 + i, target_text * 5, "srcX") for i in range(3)]   # target-like
        + [(20 + i, "zz yy xx ww vv uu tt ss " * 4, "srcX") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    monkeypatch.setattr(LQ, "table", lambda _s, _d, _n: df)
    out = {r["doc_id"]: r["dsir_logweight"] for r in
           LQ.cur_importance_resampling(spark, sf_dir).collect()}
    like = [out[10 + i] for i in range(3) if 10 + i in out]
    unlike = [out[20 + i] for i in range(3) if 20 + i in out]
    assert like and unlike
    assert min(like) > max(unlike)


def test_perplexity_buckets_are_balanced_terciles(spark, sf_dir, monkeypatch):
    """Integer rank arithmetic must cut near-equal terciles and keep
    exactly the middle one."""
    from bigdatanycdiseasesurveillance_spark.queries import lm_q as LQ

    rows = [(i, " ".join(f"w{j % (i + 2)}" for j in range(20)), "s")
            for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    monkeypatch.setattr(LQ, "table", lambda _s, _d, _n: df)
    out = LQ.cur_perplexity_buckets(spark, sf_dir).collect()
    assert len(out) == 9
    sizes = {b: 0 for b in (0, 1, 2)}
    for r in out:
        sizes[r["ppl_bucket"]] += 1
        assert r["keep"] == (r["ppl_bucket"] == 1)
    assert sizes == {0: 3, 1: 3, 2: 3}
