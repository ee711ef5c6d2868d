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
    seen = set()
    for r in out:
        p = MM._media_params(r["doc_id"])
        seen.add(p["media_type"])
        assert r["header_ok"] is True, r
        assert r["media_type"] == p["media_type"]
        if p["media_type"] == "png":
            assert (r["width"], r["height"]) == (p["width"], p["height"])
            assert (r["bit_depth"], r["channels"]) == (8, 3)
            assert r["n_bytes"] == 45
        elif p["media_type"] == "wav":
            assert r["sample_rate"] == p["sample_rate"]
            assert r["channels"] == p["channels"]
            assert r["n_frames"] == p["n_frames"]
            assert r["n_bytes"] == 44 + p["n_frames"] * p["channels"] * 2
        else:
            assert (r["width"], r["height"]) == (p["width"], p["height"])
            assert (r["bit_depth"], r["channels"]) == (8, p["channels"])
            assert r["n_bytes"] == 32 + 3 * p["channels"]
    assert seen == {"png", "wav", "jpeg"}


def test_real_codec_detects_corruption(spark):
    """Flipping one IHDR byte must flip header_ok: the CRC check is
    real, not decorative."""
    media = MM.attach_real_media(
        spark.range(2).selectExpr("id * 6 AS doc_id")  # two PNG rows
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


def test_real_codec_jpeg_golden(spark):
    """Hand-pinned JFIF golden: a byte-exact 640x480 YCbCr header-only
    JPEG (and a 17x9 grayscale twin) must parse to exactly these
    dimensions/components via the real marker walk — and structural
    corruption (truncation, missing EOI, bad marker byte) must flip
    header_ok without failing the job. JPEG has no checksum, so
    integrity here means a well-formed marker stream: SOI, JFIF APP0,
    one SOFn, EOI terminator."""
    app0 = bytes.fromhex("ffe000104a46494600010100000100010000")
    sof_color = bytes.fromhex("ffc00011" + "08" + "01e0" + "0280" + "03"
                              + "011100" + "021100" + "031100")
    golden_color = b"\xff\xd8" + app0 + sof_color + b"\xff\xd9"
    sof_gray = bytes.fromhex("ffc0000b" + "08" + "0009" + "0011" + "01"
                             + "011100")
    golden_gray = b"\xff\xd8" + app0 + sof_gray + b"\xff\xd9"
    rows = [
        (1, "jpeg", golden_color),
        (2, "jpeg", golden_gray),
        (3, "jpeg", golden_color[:-2]),            # missing EOI
        (4, "jpeg", golden_color[:10]),            # truncated mid-APP0
        (5, "jpeg", b"\xff\xd8\x00\x00\xff\xd9"),  # bad marker byte
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    out = {r["doc_id"]: r for r in MM.decode_real_headers(media).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (640, 480, 3)
    assert (out[2]["width"], out[2]["height"], out[2]["channels"]) == (17, 9, 1)
    assert out[1]["bit_depth"] == out[2]["bit_depth"] == 8
    assert out[1]["header_ok"] is True and out[2]["header_ok"] is True
    assert all(out[i]["header_ok"] is False for i in (3, 4, 5))


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
