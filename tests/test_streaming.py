"""Streaming semantics checks beyond the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatanycdiseasesurveillance_spark.streaming import pipelines as P
from bigdatanycdiseasesurveillance_spark.tables import table


def test_stream_batch_schema_parity(spark, sf_dir):
    src = P.stream_table(spark, sf_dir, "events")
    assert src.isStreaming
    assert src.schema == table(spark, sf_dir, "events").schema


def test_streaming_daily_equals_batch(spark, sf_dir):
    got = {
        (r["day"], r["event_type"]): r["cnt"]
        for r in P.streaming_daily_counts(spark, sf_dir).collect()
    }
    want = {
        (r["day"], r["event_type"]): r["cnt"]
        for r in table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want


def test_sessionize_positive_counts(spark, sf_dir):
    out = P.streaming_sessionize(spark, sf_dir).collect()
    assert len(out) > 0
    assert all(r["n_sessions"] >= 1 for r in out)
