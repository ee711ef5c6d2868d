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
    # Self-verifying contract: xxhash64 minhash has no SQL twin (the
    # md5-replayable twin dedup_minhash_md5 IS hash-checked), so this
    # query certifies the fast path with values the oracle CAN pin:
    # the blocked-exact pair count (recomputed exactly by DuckDB), a
    # zero false-positive count (every emitted pair re-verified from
    # raw text, independently of the operator's own filter), and a
    # recall floor vs the exact pairs (measured 0.976-0.984; banding
    # theory predicts ~0.97 at s=0.7). A banding/verify regression
    # flips a value and the row goes red.
    oracle="""
        WITH toks AS (
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
            WHERE ROUND(CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE) /
                        (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))),
                        4) >= 0.7
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
               CAST(0 AS BIGINT) AS n_false_positives,
               TRUE AS recall_ge_90
        FROM pairs
    """,
    tags=("dedup", "M2", "lsh"),
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH certification: shingle -> 32-perm minhash -> 8-band
    bucketing -> equi-join candidates -> exact-Jaccard verify, then a
    contract row the oracle value-checks: exact blocked-pair count,
    independent false-positive recount (pinned 0), recall-vs-exact
    floor (pinned >= 0.9). The pair stream itself is the operator
    (D.minhash_lsh_pairs); tests/test_lsh_recall_oracle.py pins the
    banding-theory floor and the measured 0.9668 recall."""
    docs = table(spark, sf_dir, "documents")
    lsh = D.minhash_lsh_pairs(docs, threshold=0.7).select("id_a", "id_b")
    exact = D.jaccard_pairs_gemm(docs, threshold=0.7).select("id_a", "id_b")
    # independent re-verification from raw text (not the operator's
    # internal jaccard): a broken verify stage shows up as n_fp > 0.
    toks = docs.select(
        F.col("doc_id").alias("id"), D.distinct_tokens(F.col("text")).alias("tok")
    )
    rechecked = (
        lsh.join(toks.select(F.col("id").alias("id_a"), F.col("tok").alias("ta")), "id_a")
        .join(toks.select(F.col("id").alias("id_b"), F.col("tok").alias("tb")), "id_b")
        .select(D.word_jaccard(F.col("ta"), F.col("tb")).alias("j"))
    )
    n_fp = rechecked.agg(
        F.sum(F.when(F.round(F.col("j"), 4) < 0.7, 1).otherwise(0))
        .cast("long")
        .alias("n_false_positives")
    )
    n_exact = exact.agg(F.count("*").cast("long").alias("n_exact_pairs"))
    n_hit = exact.join(lsh, ["id_a", "id_b"], "left_semi").agg(
        F.count("*").cast("double").alias("n_hit")
    )
    return (
        n_exact.crossJoin(F.broadcast(n_fp))
        .crossJoin(F.broadcast(n_hit))
        .select(
            "n_exact_pairs",
            "n_false_positives",
            (F.col("n_hit") >= 0.9 * F.col("n_exact_pairs")).alias("recall_ge_90"),
        )
    )


@register(
    "dedup_simhash",
    # Self-verifying contract: xxhash64 bit-votes have no SQL twin
    # (dedup_simhash_md5 IS hash-checked), so certify the fast path
    # with oracle-pinnable values: signature count == corpus count, the
    # pigeonhole THEOREM (4 chunks of 16 bits: any pair within Hamming
    # <= 3 must agree on one chunk, so zero such pairs may be missed),
    # and the documented mid-band (Hamming 4-8) recall floor (measured
    # 0.46-0.475; pinned >= 0.40). The ground truth is an all-pairs
    # Hamming sweep over the 8-byte signatures — quadratic on purpose,
    # certification-only (the production path IS the banded operator).
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_signed,
               CAST(0 AS BIGINT) AS n_hamming_le3_missed,
               TRUE AS midband_recall_ge_40
        FROM documents
    """,
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark, sf_dir):
    """SimHash certification: 64-bit bit-vote signatures, 16-bit-chunk
    blocking, Hamming verify — plus the contract row the oracle
    value-checks (signature coverage, pigeonhole completeness, mid-band
    recall floor). The pair stream itself is D.simhash_pairs."""
    docs = table(spark, sf_dir, "documents")
    hashed = docs.select(
        F.col("doc_id").alias("id"),
        F.transform(D.distinct_tokens(F.col("text")), lambda t: F.xxhash64(t)).alias("th"),
    )
    sigs = hashed.select("id", D.simhash_signature(F.col("th")).alias("sig"))
    emitted = D.simhash_pairs(docs, max_hamming=8).select("id_a", "id_b")
    a = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sa"))
    b = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sb"))
    allp = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("h"),
        )
    )
    le3 = allp.filter(F.col("h") <= 3).select("id_a", "id_b")
    mid = allp.filter((F.col("h") >= 4) & (F.col("h") <= 8)).select("id_a", "id_b")
    n_docs = sigs.agg(F.count("*").cast("long").alias("n_docs_signed"))
    n_missed = le3.join(emitted, ["id_a", "id_b"], "left_anti").agg(
        F.count("*").cast("long").alias("n_hamming_le3_missed")
    )
    n_mid = mid.agg(F.count("*").cast("double").alias("n_mid"))
    n_mid_hit = mid.join(emitted, ["id_a", "id_b"], "left_semi").agg(
        F.count("*").cast("double").alias("n_mid_hit")
    )
    return (
        n_docs.crossJoin(F.broadcast(n_missed))
        .crossJoin(F.broadcast(n_mid))
        .crossJoin(F.broadcast(n_mid_hit))
        .select(
            "n_docs_signed",
            "n_hamming_le3_missed",
            (F.col("n_mid_hit") >= 0.40 * F.col("n_mid")).alias(
                "midband_recall_ge_40"
            ),
        )
    )


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
    bench=True,
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
