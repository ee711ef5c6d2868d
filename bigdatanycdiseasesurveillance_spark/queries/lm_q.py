"""LM-pipeline operators: corpus-LM quality scoring and
temperature-based source mixing — the two knobs a pretraining-data
recipe turns after dedup/curation (filter docs the corpus model finds
improbable; reweight sources toward a smoothed distribution).

Scale shapes: the unigram model is vocabulary-sized and broadcasts, so
scoring is explode -> broadcast join -> per-doc groupBy (one shuffle on
doc_id, map-side combinable). Mixing is the same one-window-per-stratum
profile as domain caps/token budgets: the md5 deviate makes membership
layout-independent (re-runs and retries select identical documents —
rand() would not), and the source-weight table is sources-sized.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.text_funcs import tokens
from ..registry import register
from ..tables import table

_MIX_ALPHA = 0.5  # temperature smoothing exponent (count^alpha)
_MIX_BUDGET = 0.5  # select half the corpus


@register(
    "txt_unigram_logprob",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(lower(text), ' '),
                                      t -> t <> '')) AS term
            FROM documents
        ),
        uni AS (
            SELECT term, COUNT(*) AS c FROM tok GROUP BY term
        ),
        tot AS (SELECT SUM(c) AS n FROM uni),
        scored AS (
            SELECT t.doc_id,
                   COUNT(*) AS n_tokens,
                   AVG(ln(u.c * 1.0 / tot.n)) AS lp
            FROM tok t JOIN uni u ON t.term = u.term, tot
            GROUP BY t.doc_id
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               ROUND(lp, 4) AS avg_logprob
        FROM scored
    """,
    tags=("text", "lm", "quality"),
)
def txt_unigram_logprob(spark, sf_dir):
    """Corpus-LM quality score: per-document mean unigram
    log-likelihood under the corpus's own term distribution — the
    perplexity-filter stand-in (real LM scoring swaps the broadcast
    unigram table for a model UDF; the dataflow is identical).
    Improbable-token documents score low and get filtered by the
    curation tier."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    uni = tok.groupBy("term").agg(F.count("*").alias("c"))
    tot = uni.agg(F.sum("c").alias("n"))
    return (
        tok.join(F.broadcast(uni), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") * 1.0 / F.col("n"))), 4).alias(
                "avg_logprob"
            ),
        )
    )


@register(
    "mix_temperature_sampling",
    oracle=f"""
        WITH counts AS (
            SELECT source, COUNT(*) AS n FROM documents GROUP BY source
        ),
        w AS (
            SELECT source, n,
                   POWER(n, {_MIX_ALPHA})
                       / SUM(POWER(n, {_MIX_ALPHA})) OVER () AS wt
            FROM counts
        ),
        tgt AS (
            SELECT source, n,
                   CAST(FLOOR(ROUND(wt * {_MIX_BUDGET}
                              * (SELECT SUM(n) FROM counts), 9)) AS BIGINT)
                       AS target_n
            FROM w
        ),
        ranked AS (
            SELECT d.source, d.doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.source
                       ORDER BY md5('mix:' || CAST(d.doc_id AS VARCHAR)), d.doc_id
                   ) AS rk
            FROM documents d
        )
        SELECT t.source,
               CAST(t.n AS BIGINT) AS n_docs,
               t.target_n,
               CAST(SUM(CASE WHEN r.rk <= t.target_n THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_selected
        FROM ranked r JOIN tgt t ON r.source = t.source
        GROUP BY t.source, t.n, t.target_n
    """,
    tags=("curation", "mixing", "temperature"),
)
def mix_temperature_sampling(spark, sf_dir):
    """Temperature-smoothed source mixing (the pretraining-recipe
    reweighting: sample source s proportional to count^alpha, alpha=0.5,
    total budget = half the corpus). Selection is the smallest md5
    deviates per source — deterministic, layout-independent, and
    replayable by the oracle; at 100 TB the weight table is
    sources-sized and the selection is one window per stratum."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    wsum = Window.partitionBy()
    total = counts.agg(F.sum("n").alias("total"))
    tgt = (
        counts.withColumn(
            "wt",
            F.pow(F.col("n"), _MIX_ALPHA)
            / F.sum(F.pow(F.col("n"), _MIX_ALPHA)).over(wsum),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "n",
            # ROUND before FLOOR: wt comes from a float window-SUM whose
            # summation order differs between engines; a 1-ulp drift at an
            # integer boundary would flip FLOOR by 1.
            F.floor(F.round(F.col("wt") * _MIX_BUDGET * F.col("total"), 9))
            .cast("long")
            .alias("target_n"),
        )
    )
    rk = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
        F.asc("doc_id"),
    )
    ranked = docs.select("source", "doc_id").withColumn(
        "rk", F.row_number().over(rk)
    )
    return (
        ranked.join(F.broadcast(tgt), "source")
        .groupBy("source", "n", "target_n")
        .agg(
            F.sum(F.when(F.col("rk") <= F.col("target_n"), 1).otherwise(0))
            .cast("long")
            .alias("n_selected")
        )
        .select(
            "source",
            F.col("n").cast("long").alias("n_docs"),
            "target_n",
            "n_selected",
        )
    )
