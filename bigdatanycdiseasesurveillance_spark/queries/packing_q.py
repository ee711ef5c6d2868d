"""Sequence-packing query corpus (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.packing import pack_concat_chunks, pack_greedy_ffd
from ..registry import register
from ..tables import table


def _with_tokens(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    n = F.size(F.filter(F.split(F.lower("text"), " "), lambda t: t != ""))
    return d.select("doc_id", n.cast("long").alias("n_tokens"))


@register(
    "pack_concat_chunks_spans",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS BIGINT) AS n_tokens
            FROM documents
        ), c AS (
            SELECT doc_id, n_tokens,
                   SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS end_tok
            FROM t
        )
        SELECT doc_id, n_tokens,
               CAST(end_tok - n_tokens AS BIGINT) AS start_tok,
               CAST(end_tok AS BIGINT) AS end_tok,
               CAST((end_tok - n_tokens) // 256 AS BIGINT) AS first_chunk,
               CAST((end_tok - 1) // 256 AS BIGINT) AS last_chunk,
               CAST((end_tok - 1) // 256 - (end_tok - n_tokens) // 256 + 1
                    AS BIGINT) AS n_chunks_spanned
        FROM c
    """,
    tags=("packing", "training-data"),
)
def pack_concat_chunks_spans(spark, sf_dir):
    """GPT-style concat-and-chunk packing accounting: each doc's token
    span in the concatenated stream and the 256-token training chunks
    it lands in. One cumulative-sum window — fully SQL-replayable."""
    return pack_concat_chunks(_with_tokens(spark, sf_dir), budget=256)


@register(
    "pack_greedy_ffd_profile",
    oracle=None,  # bin packing is inherently sequential per bucket —
    # no SQL oracle; invariants (every doc packed once, no pack over
    # budget, utilization >= 90%) are pinned in tests/test_packing.py.
    tags=("packing", "training-data"),
)
def pack_greedy_ffd_profile(spark, sf_dir):
    """Boundary-respecting FFD packing (instruction-tuning layout):
    per-pack fill profile. Bucketed applyInPandas — Arrow batch per
    bucket, pack ids namespaced by bucket."""
    packed = pack_greedy_ffd(_with_tokens(spark, sf_dir), budget=256)
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
        )
        .withColumn(
            "fill_pct",
            F.round(F.col("pack_tokens").cast("double") / 256.0 * 100, 2),
        )
    )
