"""Vector math over ArrayType(FloatType) columns — pure column
expressions (higher-order functions), no UDFs, so similarity scans stay
inside whole-stage codegen.

The reference stores 384-dim MiniLM embeddings in ChromaDB and lets it
compute cosine similarity (reference:
src/spark_consumers/embedding_consumer.py:215-243;
src/database/chromadb_client.py:194-306). Here embeddings are a native
ArrayType column and cosine is `zip_with` + `aggregate` — vectorizable,
broadcastable, and pushdown-friendly.

Elements are cast to double before arithmetic: float32 accumulation
drifts ~1e-7 which is visible after rounding; double matches the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (cast first via as_double)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_cols(a: Column, b: Column) -> Column:
    """Cosine over raw float arrays: casts then computes."""
    return cosine(as_double(a), as_double(b))


def unit(vec: Column) -> Column:
    """Unit-normalized double vector. Pairwise plans should project this
    ONCE per side before the join — cosine then degenerates to a single
    dot() per pair instead of dot + two norms (3x less array work on the
    O(pairs) hot path, and the cast/norm runs O(n) not O(pairs))."""
    v = as_double(vec)

    def _scale(u: Column) -> Column:
        n = F.sqrt(F.aggregate(F.transform(u, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
        return F.transform(u, lambda x: x / n)

    # bind v via a one-element transform so the cast doesn't re-run per
    # element of the norm + scale passes
    return F.element_at(F.transform(F.array(v), _scale), 1)
