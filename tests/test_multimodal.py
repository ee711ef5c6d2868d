"""Multimodal plumbing: determinism, schema, batch shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatanycdiseasesurveillance_spark.operators import multimodal as MM
from bigdatanycdiseasesurveillance_spark.tables import table


def test_decode_deterministic_and_total(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    media = MM.attach_media(docs)
    a = sorted(map(tuple, MM.decode_media(media).collect()))
    b = sorted(map(tuple, MM.decode_media(media).collect()))
    assert a == b
    assert len(a) == docs.count()


def test_resize_never_upscales(spark, sf_dir):
    decoded = MM.resize_plan(MM.decode_media(MM.attach_media(table(spark, sf_dir, "documents"))))
    bad = decoded.filter(
        (F.col("target_w") > F.col("width")) | (F.col("target_h") > F.col("height"))
    ).count()
    assert bad == 0
    over = decoded.filter(
        (F.col("target_w") > 256) | (F.col("target_h") > 256)
    ).count()
    assert over == 0


def test_frame_sampling_only_video(spark, sf_dir):
    out = MM.frame_sample(MM.decode_media(MM.attach_media(table(spark, sf_dir, "documents"))))
    assert out.filter((F.col("media_type") != "video") & (F.col("n_sampled") > 0)).count() == 0
    video = out.filter(F.col("media_type") == "video")
    assert video.filter(F.col("n_sampled") == 0).count() == 0


def test_real_codec_round_trip(spark, sf_dir):
    """Builder -> stdlib parser round trip over REAL bytes: metadata
    must match the closed-form parameters and every header must verify
    (PNG CRC32, WAV RIFF size)."""
    docs = table(spark, sf_dir, "documents").limit(64)
    out = MM.decode_real_headers(MM.attach_real_media(docs)).collect()
    assert len(out) == 64
    for r in out:
        p = MM._media_params(r["doc_id"])
        assert r["header_ok"] is True, r
        assert r["media_type"] == p["media_type"]
        if p["media_type"] == "png":
            assert (r["width"], r["height"]) == (p["width"], p["height"])
            assert (r["bit_depth"], r["channels"]) == (8, 3)
            assert r["n_bytes"] == 45
        else:
            assert r["sample_rate"] == p["sample_rate"]
            assert r["channels"] == p["channels"]
            assert r["n_frames"] == p["n_frames"]
            assert r["n_bytes"] == 44 + p["n_frames"] * p["channels"] * 2


def test_real_codec_detects_corruption(spark):
    """Flipping one IHDR byte must flip header_ok: the CRC check is
    real, not decorative."""
    media = MM.attach_real_media(
        spark.range(2).selectExpr("id * 2 AS doc_id")  # two PNG rows
    )
    corrupted = media.select(
        "doc_id",
        "media_type",
        # flip a byte inside the IHDR data (offset 18 = width field)
        F.concat(
            F.expr("substring(payload, 1, 18)"),
            F.expr("CAST(X'FF' AS BINARY)"),
            F.expr("substring(payload, 20, 100)"),
        ).alias("payload"),
    )
    rows = MM.decode_real_headers(corrupted).collect()
    assert rows and all(r["header_ok"] is False for r in rows)


def test_real_codec_malformed_payload_is_data_not_crash(spark):
    # truncated / structurally bogus blobs must come back header_ok=False
    # (zeroed metadata), never fail the job
    from bigdatanycdiseasesurveillance_spark.operators.multimodal import (
        decode_real_headers,
    )

    rows = [
        (1, "png", b"\x89PNG\r\n\x1a"),          # truncated signature
        (2, "wav", b"RIFFxxxx"),                  # not a parseable wave
        (3, "png", b""),                          # empty
        (4, "wav", b"\x00" * 16),                 # garbage
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    out = {r["doc_id"]: r for r in decode_real_headers(media).collect()}
    assert len(out) == 4
    assert not any(r["header_ok"] for r in out.values())
    assert all(r["width"] == 0 and r["sample_rate"] == 0 for r in out.values())
