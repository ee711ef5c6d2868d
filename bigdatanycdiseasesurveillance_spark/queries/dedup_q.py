"""Deduplication query corpus (M1-M3 + training-data dedup) over
`documents` and `embeddings`."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..registry import register
from ..tables import table

_NORM_SQL = (
    "regexp_replace(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),"
    " ' +', ' ', 'g')"
)


@register(
    "dedup_exact_hash",
    oracle=f"""
        SELECT md5({_NORM_SQL}) AS fp,
               MIN(doc_id) AS canonical_id,
               COUNT(*) AS dup_count
        FROM documents GROUP BY 1
    """,
    tags=("dedup", "M1"),
)
def dedup_exact_hash(spark, sf_dir):
    """M1: exact dedup via normalized-text hash groups; canonical record
    = lowest id (deterministic replacement for the reference's
    first-seen-wins, SURVEY §7.4 #1)."""
    return D.exact_dedup_groups(table(spark, sf_dir, "documents"))


@register(
    "dedup_jaccard_pairs",
    oracle="""
        WITH toks AS (
            SELECT doc_id, source, n_chars,
                   list_distinct(list_filter(string_split(lower(text), ' '),
                                             t -> t <> '')) AS tok
            FROM documents
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   ROUND(CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE) /
                         (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))),
                         4) AS jaccard
            FROM toks a JOIN toks b
              ON a.source = b.source
             AND floor(a.n_chars / 50) = floor(b.n_chars / 50)
             AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.7
    """,
    tags=("dedup", "M2"),
    bench=True,
)
def dedup_jaccard_pairs(spark, sf_dir):
    """M2-class word-Jaccard near-dup pairs, blocked by (source, length
    bucket) so the pair space never goes O(n²) on the full corpus.
    Runs the per-block GEMM formulation (each text crosses the wire
    once; pair intersections are one matrix multiply per block); the
    pure-DataFrame jaccard_pairs computes the same result and is
    cross-checked in tests/test_dedup.py."""
    return D.jaccard_pairs_gemm(table(spark, sf_dir, "documents"), threshold=0.7)


@register(
    "dedup_minhash_lsh",
    oracle=None,  # probabilistic candidate generation — rows-only check;
    # every emitted pair is exact-Jaccard-verified >= 0.7, so output is a
    # subset of dedup_jaccard_pairs without its blocking constraint
    # (asserted in tests/test_dedup.py).
    tags=("dedup", "M2", "lsh"),
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup pairs: shingle -> 32-perm minhash -> 8-band
    bucketing -> equi-join candidates -> exact-Jaccard verify."""
    return D.minhash_lsh_pairs(table(spark, sf_dir, "documents"), threshold=0.7)


@register(
    "dedup_simhash",
    oracle=None,  # 64-bit simhash banding — deterministic but its bit
    # arithmetic has no reasonable ANSI-SQL oracle; structural checks in
    # tests/test_dedup.py.
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs: 64-bit bit-vote signatures, 16-bit-chunk
    blocking, Hamming-distance verify."""
    return D.simhash_pairs(table(spark, sf_dir, "documents"), max_hamming=8)


@register(
    "dedup_embedding_cosine",
    oracle="""
        SELECT * FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 4)
                       AS cosine_sim
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
        ) WHERE cosine_sim >= 0.35
    """,
    tags=("dedup", "M3", "embedding"),
)
def dedup_embedding_cosine(spark, sf_dir):
    """M3: embedding-cosine near-dup pairs within blocks (label = LSH
    bucket stand-in). Cosine is a codegen'd zip_with/aggregate — no UDF."""
    return D.embedding_cosine_pairs(table(spark, sf_dir, "embeddings"), threshold=0.35)


@register(
    "dedup_duplicate_groups",
    oracle="""
        WITH RECURSIVE toks AS (
            SELECT doc_id, source, n_chars,
                   list_distinct(list_filter(string_split(lower(text), ' '),
                                             t -> t <> '')) AS tok
            FROM documents
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM toks a JOIN toks b
              ON a.source = b.source
             AND floor(a.n_chars / 50) = floor(b.n_chars / 50)
             AND a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE) /
                  (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok)))
                  >= 0.7
        ), edges AS (
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs
        ), walk(node, comp) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.node
            WHERE w.comp < e.d
        ), labels AS (
            SELECT node AS doc_id, MIN(comp) AS canonical_id
            FROM walk GROUP BY node
        )
        SELECT canonical_id, CAST(COUNT(*) AS BIGINT) AS group_size
        FROM labels GROUP BY canonical_id HAVING COUNT(*) > 1
    """,
    tags=("dedup", "M2", "groups"),
)
def dedup_duplicate_groups(spark, sf_dir):
    """Near-dup GROUPS: blocked Jaccard pairs -> iterative min-label
    connected components -> (canonical_id, group_size). The group-level
    contract stays linear in corpus size even when the pair list is
    quadratic (templated corpora) — this is the operator a 100 TB dedup
    pipeline actually materializes."""
    pairs = D.jaccard_pairs(table(spark, sf_dir, "documents"), threshold=0.7)
    labels = D.connected_components(pairs)
    return (
        labels.groupBy("canonical_id")
        .agg(F.count("*").cast("long").alias("group_size"))
        .filter(F.col("group_size") > 1)
    )
