"""M4 embedding generation + skew-salting operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatanycdiseasesurveillance_spark.operators.embeddings import (
    embedding_profile,
    encode_documents,
)
from bigdatanycdiseasesurveillance_spark.operators.skew import salted_join
from bigdatanycdiseasesurveillance_spark.tables import table


def test_encode_deterministic_and_normalized(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    a = {r["doc_id"]: r["embedding"] for r in encode_documents(docs, dim=32).collect()}
    b = {r["doc_id"]: r["embedding"] for r in encode_documents(docs, dim=32).collect()}
    assert a == b  # same text -> same vector, across runs
    import math

    for vec in a.values():
        assert len(vec) == 32
        assert abs(math.sqrt(sum(x * x for x in vec)) - 1.0) < 1e-5


def test_encode_batch_size_independence(spark, sf_dir):
    """Arrow batch boundaries must not affect output values."""
    docs = table(spark, sf_dir, "documents").limit(40)
    big = {r["doc_id"]: r["embedding"] for r in encode_documents(docs, dim=16).collect()}
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        small = {
            r["doc_id"]: r["embedding"] for r in encode_documents(docs, dim=16).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert big == small


def test_embedding_profile_shape(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(60)
    prof = embedding_profile(encode_documents(docs, dim=16)).collect()
    assert all(r["dim"] == 16 for r in prof)
    assert all(abs(r["mean_l2_norm"] - 1.0) < 1e-3 for r in prof)
    assert sum(r["n_docs"] for r in prof) == 60


def test_salted_join_equals_plain_join(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 2.0), ("purchase", 3.0), ("error", 4.0), ("signup", 5.0)],
        "event_type string, weight double",
    )
    plain = ev.join(dim, "event_type").groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("wv")
    )
    salted = salted_join(ev, dim, "event_type", salt=4).groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("wv")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    """A single hot key must occupy `salt` distinct shuffle buckets."""
    hot = spark.range(1000).select(
        F.lit("hot").alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([("hot", 9.9)], "k string, w double")
    out = salted_join(hot, dim, "k", salt=8, left_salt_from=["payload"])
    assert out.count() == 1000
    # salt derived from payload hash: verify ~uniform spread across 8 values
    from bigdatanycdiseasesurveillance_spark.operators.skew import F as _F  # noqa: F401

    salts = (
        hot.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("payload")), F.lit(8)).cast("int")
        )
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(salts) == 8
    assert all(50 < r["count"] < 250 for r in salts)
