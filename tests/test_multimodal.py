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
