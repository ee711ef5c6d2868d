"""Prefix-filtering set-similarity join (AllPairs/PPJoin candidate
scheme, Bayardo et al. WWW'07 / Xiao et al. ICDE'08).

EXACT Jaccard join without blocking columns and without all-pairs: the
complete answer for ``jaccard(A,B) >= t`` over the whole corpus. The
blocked ``dedup.jaccard_pairs`` needs a block key (source, length) and
misses cross-block pairs; MinHash trades recall for speed. This
operator has neither limitation:

1. order every document's token set by GLOBAL token frequency
   (rarest first) — the ordering key is the (freq, token) struct
   itself, so no global rank/row_number over the vocabulary is needed;
2. index only each set's PREFIX — the first ``|A| - ceil(t*|A|) + 1``
   tokens. Theorem (prefix filter): two sets with Jaccard >= t must
   share at least one token inside both prefixes under any common
   total order. Candidates = prefix-token equi-join; exact verify after.

Why it scales: prefix tokens are by construction the RAREST tokens in
each document, so the equi-join buckets are tiny and skew-free — the
frequency order is simultaneously the correctness device and the skew
device. Shuffles: one groupBy(token) for frequencies, one
groupBy(doc) to rebuild sorted sets, one equi-join on prefix tokens.
All linear in corpus token count.

The reference's dedup consumer compares each new doc against a cached
window of recent docs (reference:
src/spark_consumers/deduplication_consumer.py:150-210) — a sliding
subset, not the full corpus. This is the full-corpus exact equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import distinct_tokens, word_jaccard


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
) -> DataFrame:
    """All pairs with word-Jaccard >= threshold, exactly.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to
    4 (round-on-both-sides parity rule).
    """
    toks = df.select(
        F.col(id_col).alias("id"), distinct_tokens(F.col(text_col)).alias("tok")
    ).filter(F.size("tok") > 0)

    tok_doc = toks.select("id", F.explode("tok").alias("t"))
    freq = tok_doc.groupBy("t").agg(F.count("*").alias("f"))

    # Rebuild each set sorted rare-token-first; (f, t) is a total order.
    ordered = (
        tok_doc.join(freq, "t")
        .groupBy("id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("f", "t"))), lambda s: s["t"]
            ).alias("stok")
        )
    )

    # prefix length |A| - ceil(t*|A|) + 1  (>= 1 always)
    sz = F.size("stok")
    plen = sz - F.ceil(F.lit(threshold) * sz).cast("int") + F.lit(1)
    prefixes = ordered.select(
        "id", F.explode(F.slice("stok", 1, plen)).alias("pt")
    )

    cand = (
        prefixes.alias("a")
        .join(prefixes.alias("b"), F.col("a.pt") == F.col("b.pt"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    j = word_jaccard(F.col("ta.stok"), F.col("tb.stok"))
    return (
        cand.join(ordered.alias("ta"), F.col("id_a") == F.col("ta.id"))
        .join(ordered.alias("tb"), F.col("id_b") == F.col("tb.id"))
        .select("id_a", "id_b", F.round(j, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
