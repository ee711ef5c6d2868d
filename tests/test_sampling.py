"""Deterministic sampling properties: the guarantees rand(seed) lacks."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatanycdiseasesurveillance_spark.operators.sampling import (
    sample_bernoulli,
    sample_stratified,
    train_test_split,
)
from bigdatanycdiseasesurveillance_spark.tables import table


def test_sample_membership_is_layout_independent(spark, sf_dir):
    """Same data, different partitioning -> same sampled SET. This is
    the property that makes 100 TB reruns reproducible and is exactly
    where df.sample(seed=...) fails."""
    docs = table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in sample_bernoulli(docs, "doc_id", 0.3).collect()}
    b = {
        r["doc_id"]
        for r in sample_bernoulli(docs.repartition(17), "doc_id", 0.3).collect()
    }
    assert a == b and 0 < len(a) < docs.count()


def test_split_is_disjoint_and_exhaustive(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    tagged = train_test_split(docs, "doc_id", test_rate=0.2)
    counts = {r["split"]: r["n"] for r in tagged.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "test"}
    assert sum(counts.values()) == docs.count()


def test_nested_samples_are_monotone(spark, sf_dir):
    """A p-sample is a subset of a q-sample when p <= q (same salt) —
    the deviate construction gives nested samples for free, so a 1%
    debug corpus is always inside the 10% dev corpus."""
    docs = table(spark, sf_dir, "documents")
    small = {r["doc_id"] for r in sample_bernoulli(docs, "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in sample_bernoulli(docs, "doc_id", 0.4).collect()}
    assert small <= big


def test_stratified_respects_full_and_zero_rates(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = sample_stratified(
        docs, "doc_id", "source", {"src0": 1.0}, default_rate=0.0
    )
    got = {r["source"] for r in out.select("source").distinct().collect()}
    assert got == {"src0"}
    assert out.count() == docs.filter(F.col("source") == "src0").count()
