"""Similarity-search query corpus (M5 + ANN) over `embeddings`."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import similarity as S
from ..registry import register
from ..tables import table


def _query_vec(spark, sf_dir, vec_id: int = 0) -> list[float]:
    row = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return list(row["embedding"])


@register(
    "ann_cosine_topk",
    oracle="""
        WITH q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
        )
        SELECT e.vec_id,
               ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4)
                   AS cosine_sim
        FROM embeddings e, q
        WHERE e.vec_id <> 0
        ORDER BY cosine_sim DESC, e.vec_id
        LIMIT 10
    """,
    tags=("ann", "M5"),
    bench=True,
)
def ann_cosine_topk(spark, sf_dir):
    """M5: exact brute-force cosine top-10 for a query vector (vec 0) —
    one scan + TakeOrderedAndProject, cosine fully in codegen."""
    qv = _query_vec(spark, sf_dir, 0)
    emb = table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, qv, k=10, where=F.col("vec_id") != 0)


@register(
    "ann_knn_per_label",
    oracle="""
        SELECT * FROM (
            SELECT a.vec_id, b.vec_id AS neighbor_id,
                   ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 4)
                       AS cosine_sim,
                   CAST(row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                             CAST(b.embedding AS DOUBLE[])), 4) DESC,
                                b.vec_id) AS BIGINT) AS rank
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id <> b.vec_id
        ) WHERE rank <= 3
    """,
    tags=("ann", "knn"),
    bench=True,
)
def ann_knn_per_label(spark, sf_dir):
    """All-vectors kNN within blocks (IVF-cell-restricted knn-join): the
    building block for embedding dedup / clustering at scale. Runs the
    GEMM formulation (one Arrow transfer per vector, BLAS pair work);
    the pure-DataFrame knn_per_block variant computes the same result
    and is cross-checked in tests/test_similarity.py."""
    return S.knn_per_block_gemm(table(spark, sf_dir, "embeddings"), k=3)


@register(
    "ann_ivf_search",
    oracle="""
        -- positions hardcoded to the testdata's 64-dim embeddings (the
        -- engine side derives dimension from the data; DuckDB range()
        -- needs a constant)
        WITH pos AS (SELECT CAST(range AS INTEGER) + 1 AS p FROM range(64)),
        cent AS (
            SELECT label, list(avg_val ORDER BY p) AS centroid
            FROM (SELECT label, p, AVG(CAST(embedding[p] AS DOUBLE)) AS avg_val
                  FROM embeddings CROSS JOIN pos GROUP BY label, p)
            GROUP BY label
        ), q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
        ), probe AS (
            SELECT label FROM cent, q
            ORDER BY list_cosine_similarity(centroid, qv) DESC, label
            LIMIT 2
        )
        SELECT e.vec_id,
               ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4)
                   AS cosine_sim
        FROM embeddings e, q
        WHERE e.label IN (SELECT label FROM probe) AND e.vec_id <> 0
        ORDER BY cosine_sim DESC, e.vec_id
        LIMIT 10
    """,
    tags=("ann", "ivf"),
)
def ann_ivf_search(spark, sf_dir):
    """IVF search: rank cells by centroid similarity, scan only nprobe=2
    cells, exact top-k inside — the 1/k-corpus-scan scale path."""
    qv = _query_vec(spark, sf_dir, 0)
    return S.ivf_search(
        table(spark, sf_dir, "embeddings"), qv, k=10, nprobe=2,
        where=F.col("vec_id") != 0,
    )


@register(
    "emb_encode_profile",
    oracle=None,  # the hash-based pseudo-encoder (hermetic stand-in for
    # sentence-transformers) is not SQL-expressible; determinism and
    # batch-shape invariants are pinned in tests/test_embeddings.py.
    tags=("embedding", "M4"),
    bench=True,
)
def emb_encode_profile(spark, sf_dir):
    """M4: mapInPandas embedding generation over documents (executor-
    local encoder singleton, Arrow batches) + per-language profile of
    the encoded corpus."""
    from ..operators.embeddings import embedding_profile, encode_documents

    docs = table(spark, sf_dir, "documents")
    return embedding_profile(encode_documents(docs, dim=64), "lang")


@register(
    "ann_filtered_search",
    oracle="""
        WITH q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
        )
        SELECT e.vec_id, e.label,
               ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4)
                   AS cosine_sim
        FROM embeddings e, q
        WHERE e.vec_id <> 0 AND e.label IN (1, 3, 5) AND e.vec_id % 2 = 0
        ORDER BY cosine_sim DESC, e.vec_id
        LIMIT 10
    """,
    tags=("ann", "M5", "filtered"),
)
def ann_filtered_search(spark, sf_dir):
    """M5 with metadata filters: the reference's ChromaDB
    query(where={borough/severity}) (chromadb_client.py:194-306) is a
    plain filter() fused into the similarity scan — predicates push to
    the parquet scan, then cosine + TakeOrdered run on the survivors."""
    qv = _query_vec(spark, sf_dir, 0)
    emb = table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(
        emb,
        qv,
        k=10,
        where=(F.col("vec_id") != 0)
        & F.col("label").isin(1, 3, 5)
        & (F.col("vec_id") % 2 == 0),
        extra_cols=["label"],
    )
