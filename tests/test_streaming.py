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


def test_multi_sink_fanout(spark, sf_dir, tmp_path):
    """ST5: one analyzed stream feeding two independent sinks (the
    reference's relevant/irrelevant JSON split) — both drain with
    availableNow and partition the input exactly."""
    src = P.stream_table(spark, sf_dir, "events")
    analyzed = src.withColumn("flagged", F.col("event_type") == "error")
    qs = []
    for flag, sub in ((True, "flagged"), (False, "clean")):
        out = tmp_path / sub
        qs.append(
            analyzed.filter(F.col("flagged") == flag)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / f"ckpt_{sub}"))
            .trigger(availableNow=True)
            .start()
        )
    for q in qs:
        q.awaitTermination()
    total = table(spark, sf_dir, "events").count()
    n_flagged = spark.read.parquet(str(tmp_path / "flagged")).count()
    n_clean = spark.read.parquet(str(tmp_path / "clean")).count()
    assert n_flagged + n_clean == total
    assert n_flagged == table(spark, sf_dir, "events").filter("event_type = 'error'").count()
