"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / resize / frame-sample as Arrow-batched
mapInPandas stages.

Real image/audio/video codecs are NOT in this container, so the byte-
level decode is a clearly-marked deterministic stub (`_fake_decode`) —
everything around it (schema, binary column handling, batch shape,
partitioning, the mapInPandas signature) is the real scale path: swap
`_fake_decode` for a PIL/ffmpeg call and nothing else changes.

Scale notes: mapInPandas streams Arrow batches — payloads never
materialize as one driver list; per-batch decode keeps executor memory
bounded by batch size (spark.sql.execution.arrow.maxRecordsPerBatch),
which is exactly how real media decode must run at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width long, height long, "
    "n_frames long, sample_rate long, checksum string"
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Build the multimodal bronze shape from the documents table: the
    text bytes play the opaque binary payload; media_type cycles
    deterministically. Real pipelines get these columns from ingestion."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
    )


def _make_decoder():
    """Closure (pickle-by-value). STUB DECODE: derives deterministic
    pseudo-metadata from an md5 of the payload. Replace the body of
    `decode_one` with PIL/soundfile/ffmpeg for real media — the Spark
    plumbing is identical."""

    def decode_batches(batch_iter):
        import hashlib

        import pandas as _pd

        def decode_one(payload: bytes, media_type: str):
            digest = hashlib.md5(payload).hexdigest()
            seed = int(digest[:8], 16)
            width = 64 + seed % 1024 if media_type in ("image", "video") else 0
            height = 64 + (seed >> 10) % 1024 if media_type in ("image", "video") else 0
            n_frames = 1 if media_type == "image" else 24 + seed % 240
            sample_rate = 16000 if media_type == "audio" else 0
            return width, height, n_frames, sample_rate, digest

        for pdf in batch_iter:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                w, h, nf, sr, digest = decode_one(payload, r["media_type"])
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "media_type": r["media_type"],
                        "n_bytes": len(payload),
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                        "sample_rate": sr,
                        "checksum": digest,
                    }
                )
            yield _pd.DataFrame(rows)

    return decode_batches


def decode_media(media: DataFrame) -> DataFrame:
    """Decode stage: mapInPandas over (doc_id, payload, media_type)."""
    from ..tables import parallelize_scan

    # decode is the canonical per-core bottleneck of a media pipeline —
    # rebalance single-split inputs so all cores decode
    return parallelize_scan(media).mapInPandas(_make_decoder(), DECODED_SCHEMA)


def resize_plan(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning as native column math (the scale factor / target
    dims don't need Python): preserves aspect ratio, never upscales."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side))
        / F.greatest(F.col("width"), F.col("height"), F.lit(1)).cast("double"),
    )
    return decoded.withColumn("scale", F.round(scale, 4)).withColumn(
        "target_w", F.floor(F.col("width") * scale).cast("long")
    ).withColumn("target_h", F.floor(F.col("height") * scale).cast("long"))


def frame_sample(decoded: DataFrame, every_k: int = 10) -> DataFrame:
    """Frame sampling for video rows: native sequence() — the sampled
    index list is plan-side; only actual frame extraction would be a
    mapInPandas decode."""
    return decoded.withColumn(
        "sampled_frames",
        F.when(
            F.col("media_type") == "video",
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k)),
        ).otherwise(F.array().cast("array<long>")),
    ).withColumn("n_sampled", F.size("sampled_frames").cast("long"))
