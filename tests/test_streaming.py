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


def test_watermark_drops_late_rows(spark, tmp_path):
    """ST7 semantics pin: with a 10-minute watermark on 1-hour windows,
    a row arriving after the watermark passed its window is dropped from
    the append-mode result; an in-watermark late row is counted."""
    import json

    d = tmp_path / "stream_src"
    d.mkdir()
    base = [
        {"k": "a", "ts": "2024-01-01T00:05:00"},
        {"k": "a", "ts": "2024-01-01T00:20:00"},
        {"k": "a", "ts": "2024-01-01T03:00:00"},  # advances watermark to 02:50
    ]
    late = [
        {"k": "a", "ts": "2024-01-01T02:55:00"},  # within watermark -> kept
        {"k": "a", "ts": "2024-01-01T00:30:00"},  # window [00:00,01:00) closed -> dropped
    ]
    (d / "f0.jsonl").write_text("\n".join(json.dumps(r) for r in base))
    schema = "k string, ts timestamp"
    src = spark.readStream.schema(schema).json(str(d))
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .count()
    )
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "wm_out")

    def drain():
        q = (
            agg.select(F.col("w.start").alias("w_start"), "k", "count")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()  # batch 1: base rows; watermark advances to 02:50
    (d / "f1.jsonl").write_text("\n".join(json.dumps(r) for r in late))
    drain()  # batch 2: one late-but-allowed row, one too-late row
    # append mode emits only closed windows: [00:00,01:00) closes (end <
    # watermark 02:50) with count 2 — its 00:30 straggler arrived after
    # the close and was DROPPED; the 02:55 row sits in a still-open
    # window, so nothing else is emitted
    rows = {
        (str(r["w_start"]), r["count"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert rows == {("2024-01-01 00:00:00", 2)}


def test_foreachbatch_streaming_upsert(spark, sf_dir, tmp_path):
    """S9+S11: foreachBatch as the streaming upsert sink — each
    micro-batch merges into the target with last-writer-wins, so
    replaying a batch (at-least-once delivery) cannot duplicate rows."""
    from bigdatanycdiseasesurveillance_spark.sources.sinks import (
        upsert_last_writer_wins,
    )

    target = str(tmp_path / "upsert_target")
    src = P.stream_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )

    def merge_batch(batch_df, batch_id):
        upsert_last_writer_wins(
            batch_df.sparkSession, batch_df, target, keys=["event_id"], order_col="ts"
        )

    q = (
        src.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_src = table(spark, sf_dir, "events").count()
    merged = spark.read.parquet(target)
    assert merged.count() == n_src
    # replay the same data through a fresh stream (simulated redelivery):
    # the upsert keeps the row count stable
    q2 = (
        P.stream_table(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type")
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert spark.read.parquet(target).count() == n_src
