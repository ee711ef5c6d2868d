"""String-similarity pairs via lossless pigeonhole blocking, and
weighted sampling without replacement — two more curation primitives:
near-identical key detection (typo'd names, mirrored URLs) and
quality-weighted corpus subsampling.

Scale notes: the Hamming join's candidate set comes from three
segment equi-joins (pigeonhole: <=2 mismatches cannot touch all 3
disjoint segments, so every qualifying pair collides on at least one
block) — the engine never evaluates the O(n^2) theta join the oracle
runs; per-block fan-in is the number of strings sharing a third of
their characters, and each candidate is verified with one
character-compare pass. Weighted sampling is the Efraimidis-Spirakis
exponential-sort trick with an md5-derived deviate: one scan computing
ln(u)/w plus a top-k (TakeOrderedAndProject — per-partition heaps, no
global sort), reproducible on any partition layout and replayable
bit-for-bit by the oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sampling import deviate_sql, hash_deviate
from ..registry import register
from ..tables import table

_MAX_HAMMING = 2
_TOPK = 100
_SCALE = float(1 << 60)


@register(
    "dedup_hamming_pairs",
    oracle=f"""
        WITH p AS (
            SELECT a.c_custkey AS ai, b.c_custkey AS bi,
                   list_sum(list_transform(
                       generate_series(1, length(a.c_name)),
                       i -> CASE WHEN a.c_name[i] = b.c_name[i]
                                 THEN 0 ELSE 1 END)) AS d
            FROM customer a JOIN customer b
              ON length(a.c_name) = length(b.c_name)
             AND a.c_custkey < b.c_custkey
        )
        SELECT CAST(d AS BIGINT) AS hamming_d,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM p
        WHERE d BETWEEN 1 AND {_MAX_HAMMING}
        GROUP BY d
    """,
    tags=("dedup", "similarity", "blocking"),
)
def dedup_hamming_pairs(spark, sf_dir):
    """Same-length name pairs within Hamming distance 2, counted per
    distance. The oracle runs the ground-truth O(n^2) theta join; the
    engine builds candidates from three equi-joins on disjoint string
    segments — lossless by pigeonhole (2 mismatches cannot hit 3
    segments), so the outputs are identical while the engine's join is
    hash-partitioned on (segment_idx, length, segment_text) and never
    quadratic. Candidates dedupe on the pair key (a pair can collide
    in 2 blocks) before one verify pass per pair."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.length("c_name").alias("len"),
    )
    blocks = None
    for k in range(3):
        seg = F.expr(
            f"substring(name, CAST(floor({k} * len / 3) AS INT) + 1,"
            f" CAST(floor(({k} + 1) * len / 3) - floor({k} * len / 3) AS INT))"
        )
        b = c.select("id", "name", "len", F.lit(k).alias("k"), seg.alias("seg"))
        blocks = b if blocks is None else blocks.unionAll(b)
    a = blocks.select(
        F.col("id").alias("ai"), F.col("name").alias("an"), "len", "k", "seg"
    )
    bb = blocks.select(
        F.col("id").alias("bi"), F.col("name").alias("bn"), "len", "k", "seg"
    )
    cand = (
        a.join(bb, ["k", "len", "seg"])
        .filter(F.col("ai") < F.col("bi"))
        .select("ai", "bi", "an", "bn")
        .distinct()
    )
    d = F.expr(
        "aggregate(sequence(1, length(an)), 0, (acc, i) -> acc +"
        " CASE WHEN substring(an, i, 1) = substring(bn, i, 1) THEN 0 ELSE 1 END)"
    )
    return (
        cand.withColumn("d", d)
        .filter(F.col("d").between(1, _MAX_HAMMING))
        .groupBy(F.col("d").cast("long").alias("hamming_d"))
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


@register(
    "sample_weighted_topk",
    oracle=f"""
        WITH k AS (
            SELECT doc_id, n_chars,
                   ln(({deviate_sql("doc_id", "wsample")} + 1) / {_SCALE!r})
                       / n_chars AS skey
            FROM documents
        )
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS weight,
               ROUND(skey, 6) AS sample_key
        FROM k
        ORDER BY skey DESC, doc_id
        LIMIT {_TOPK}
    """,
    tags=("sampling", "weighted", "curation"),
)
def sample_weighted_topk(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis-Spirakis):
    draw u ~ U(0,1] deterministically from md5(doc_id), score each doc
    ln(u)/weight with weight = n_chars, keep the top-k scores — each
    doc's inclusion probability is proportional to its weight, the
    classic quality-weighted subsample. One scan plus
    TakeOrderedAndProject (per-partition top-k heaps merged at the
    driver, k rows — no global sort, no shuffle of the corpus); the
    md5 deviate makes the drawn set a pure function of the data, so
    reruns on any cluster shape and the DuckDB oracle all pick the
    identical sample."""
    d = table(spark, sf_dir, "documents")
    u = (hash_deviate(F.col("doc_id"), "wsample") + 1) / F.lit(_SCALE)
    skey = F.log(u) / F.col("n_chars")
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            skey.alias("_skey"),
        )
        .orderBy(F.desc("_skey"), F.asc("doc_id"))
        .limit(_TOPK)
        .select("doc_id", "weight", F.round("_skey", 6).alias("sample_key"))
    )
