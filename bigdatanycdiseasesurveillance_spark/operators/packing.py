"""Sequence packing — turning a document corpus into fixed-token-budget
training sequences. Two industry-standard strategies:

1. `pack_concat_chunks` — concatenate the (deterministically ordered)
   token stream and slice it into budget-sized chunks; documents may
   span a chunk boundary. This is the classic GPT-style pretraining
   layout. It is pure window arithmetic (one cumulative sum), fully
   SQL-expressible, and scales as a single sort-free window pass when
   the ordering key is the partition key's sort order.

2. `pack_greedy_ffd` — first-fit-decreasing bin packing WITHIN hash
   buckets via applyInPandas: no document crosses a sequence boundary
   (the layout instruction-tuning pipelines need). Exact FFD is
   inherently sequential, so the scale design shards the corpus into
   independent buckets (each a few thousand docs), packs each bucket in
   one Arrow batch, and namespaces pack ids by bucket. Packing quality
   loses nothing measurable: utilization is pinned >= 90% in tests
   while cross-bucket FFD could at best save one partial pack per
   bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranking import bucketed_running_sum


def pack_concat_chunks(
    df: DataFrame,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 256,
    bucket=None,
) -> DataFrame:
    """Concat-and-chunk accounting: each doc's half-open token span
    [start_tok, end_tok) in the global stream, and the chunk ids it
    touches. A doc spans `last_chunk - first_chunk + 1` sequences.

    The global running sum uses the bucketed device
    (operators/ranking.py, r10 verdict directive #5): rows bucket by
    4096-id ranges (or a caller-supplied `bucket` column for
    non-numeric ids), sum locally per bucket, and add prefix-summed
    bucket offsets computed on the control plane — value-identical to
    `SUM(n) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING)` (the oracle's
    form) with no single-partition window. Chunk ids are exact integer
    `div` arithmetic on the non-negative token offsets."""
    if bucket is None:
        # The default bucket assumes a numeric id: under non-ANSI configs
        # a non-numeric id casts to NULL and the rank join would silently
        # drop rows (ANSI mode throws instead, masking the hazard). Gate
        # on the schema type so the failure is loud and identical on all
        # configs; callers with string/uuid ids supply `bucket=`.
        dtype = df.schema[id_col].dataType.simpleString()
        if dtype not in (
            "tinyint",
            "smallint",
            "int",
            "bigint",
        ) and not dtype.startswith("decimal"):
            raise ValueError(
                f"pack_concat_chunks: default bucketing needs an integer "
                f"id column, got {id_col}:{dtype}; pass an explicit "
                f"bucket= expression (non-decreasing along {id_col})"
            )
        bucket = F.expr(f"CAST({id_col} AS BIGINT) div 4096")
    wd = df.select(id_col, F.col(n_tokens_col).cast("long").alias("n_tokens"))
    summed = bucketed_running_sum(
        wd, bucket, [F.asc(id_col)], "n_tokens", out_col="end_tok"
    )
    return summed.select(
        id_col,
        "n_tokens",
        (F.col("end_tok") - F.col("n_tokens")).alias("start_tok"),
        "end_tok",
        F.expr(f"(end_tok - n_tokens) div {budget}").alias("first_chunk"),
        F.expr(f"(end_tok - 1) div {budget}").alias("last_chunk"),
        F.expr(
            f"(end_tok - 1) div {budget} - (end_tok - n_tokens) div {budget} + 1"
        ).alias("n_chunks_spanned"),
    )


PACK_SCHEMA = (
    "doc_id long, n_tokens long, bucket int, pack_id long, pack_slot int"
)


def pack_greedy_ffd(
    df: DataFrame,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 256,
    n_buckets: int = 8,
) -> DataFrame:
    """First-fit-decreasing packing within hash buckets. Docs larger
    than the budget get a dedicated pack (flagged by pack_slot = -1).
    Deterministic: bucket = crc-free md5-independent pmod of the id,
    FFD order = (tokens desc, id). pack_id = bucket * 2^40 + local."""

    def pack_bucket(key, pdf):
        # closure: executors don't have this repo on sys.path.
        # applyInPandas hands the WHOLE group as one pandas frame
        # (unlike applyInPandasWithState's chunk iterator).
        import pandas as _pd

        (bucket,) = key
        rows = sorted(
            zip(pdf["doc_id"].tolist(), pdf["n_tokens"].tolist()),
            key=lambda r: (-r[1], r[0]),
        )
        packs: list[list[tuple[int, int]]] = []
        remaining: list[int] = []
        out = []
        for doc_id, n in rows:
            if n > budget:
                out.append((doc_id, n, bucket, len(packs), -1))
                packs.append([(doc_id, n)])
                remaining.append(0)
                continue
            for i, room in enumerate(remaining):
                if n <= room:
                    packs[i].append((doc_id, n))
                    remaining[i] = room - n
                    out.append((doc_id, n, bucket, i, len(packs[i]) - 1))
                    break
            else:
                packs.append([(doc_id, n)])
                remaining.append(budget - n)
                out.append((doc_id, n, bucket, len(packs) - 1, 0))
        base = bucket << 40
        return _pd.DataFrame(
            [
                {
                    "doc_id": d,
                    "n_tokens": n,
                    "bucket": b,
                    "pack_id": base + p,
                    "pack_slot": s,
                }
                for d, n, b, p, s in out
            ]
        )

    prepared = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )
    return prepared.groupBy("bucket").applyInPandas(pack_bucket, PACK_SCHEMA)


def sliding_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping sliding-window chunking — the LLM-prep step between
    cleaning and packing (long-context corpora are chunked with overlap
    so no span is split mid-context; RAG indexing uses the same layout).

    Chunk i of a doc covers tokens [i*stride, min(i*stride + size, n));
    starts run 0, stride, 2*stride, ... while start < n. Pure column
    arithmetic: tokenize once, explode a sequence of chunk indices,
    slice the token array per index. No shuffle at all — chunking is
    embarrassingly row-parallel, so at 100 TB it rides the scan
    partitioning end to end.
    """
    from ..functions.text_funcs import tokens

    t = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("tok"))
        .withColumn("n", F.size("tok"))
        .filter(F.col("n") > 0)
    )
    n_chunks = F.floor((F.col("n") - 1) / stride) + 1
    c = t.select(
        id_col,
        "tok",
        "n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    return c.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        F.least(F.lit(size), F.col("n") - start).cast("long").alias("chunk_len"),
        F.array_join(F.slice("tok", (start + 1).cast("int"), size), " ").alias(
            "chunk_text"
        ),
    )
