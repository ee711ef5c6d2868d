"""String-similarity pairs via lossless masked-neighborhood blocking,
and weighted sampling without replacement — two more curation
primitives: near-identical key detection (typo'd names, mirrored
URLs) and quality-weighted corpus subsampling.

Scale notes: the Hamming join's candidates come from an equi-join on
position-masked variants of each string (every C(L,2) two-position
mask) — lossless because a pair's mismatch positions are covered by
exactly one mask, and skew-proof because the join key keeps all the
string's entropy (segment-pigeonhole blocking, the textbook
alternative, goes quadratic on templated keys that share a constant
region). The engine never evaluates the O(n^2) theta join the oracle
runs. Weighted sampling is the Efraimidis-Spirakis
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
    # Oracle replays the masked-neighborhood scheme (varying-position
    # profile -> wildcard-pair keys -> hash join -> multiplicity
    # division) rather than the O(n^2) theta join, which is
    # sf1-infeasible on the DuckDB side (22G list_sum comparisons).
    # The independent brute-force ground truth lives in pytest
    # (tests/test_quality_maintenance.py::test_hamming_blocking_is_
    # lossless runs the exact theta join against this query) and in
    # the hypothesis coverage proof (tests/test_properties.py) — the
    # same replayed-pipeline trade the md5-MinHash/SimHash oracle tier
    # makes.
    oracle=f"""
        WITH c AS (
            SELECT c_custkey AS id, c_name AS name,
                   CAST(length(c_name) AS BIGINT) AS len
            FROM customer
        ), pr AS (
            SELECT len, unnest(range(1, len + 1)) AS p, name FROM c
        ), ps AS (
            SELECT len, p,
                   COUNT(DISTINCT substr(name, CAST(p AS INTEGER), 1)) AS nc
            FROM pr GROUP BY len, p
        ), vp AS (
            SELECT len, p FROM ps WHERE nc > 1
        ), vcnt AS (
            SELECT len, CAST(COUNT(*) AS BIGINT) AS v FROM vp GROUP BY len
        ), spec AS (
            SELECT a.len, a.p AS i, b.p AS j
            FROM vp a JOIN vp b ON a.len = b.len AND a.p < b.p
            UNION ALL
            SELECT len, p, p FROM vp
            WHERE len IN (SELECT len FROM vcnt WHERE v = 1)
        ), masked AS (
            SELECT c.id, c.name, s.len, s.i, s.j,
                   CASE WHEN s.i = s.j
                        THEN substr(c.name, 1, CAST(s.i - 1 AS INTEGER)) || '*'
                             || substr(c.name, CAST(s.i + 1 AS INTEGER),
                                       CAST(s.len - s.i AS INTEGER))
                        ELSE substr(c.name, 1, CAST(s.i - 1 AS INTEGER)) || '*'
                             || substr(c.name, CAST(s.i + 1 AS INTEGER),
                                       CAST(s.j - s.i - 1 AS INTEGER)) || '*'
                             || substr(c.name, CAST(s.j + 1 AS INTEGER),
                                       CAST(s.len - s.j AS INTEGER))
                   END AS mkey
            FROM c JOIN spec s ON s.len = c.len
        ), occ AS (
            SELECT a.len,
                   CASE WHEN a.i = a.j
                        THEN CASE WHEN substr(a.name, CAST(a.i AS INTEGER), 1)
                                       <> substr(b.name, CAST(a.i AS INTEGER), 1)
                                  THEN 1 ELSE 0 END
                        ELSE CASE WHEN substr(a.name, CAST(a.i AS INTEGER), 1)
                                       <> substr(b.name, CAST(a.i AS INTEGER), 1)
                                  THEN 1 ELSE 0 END
                           + CASE WHEN substr(a.name, CAST(a.j AS INTEGER), 1)
                                       <> substr(b.name, CAST(a.j AS INTEGER), 1)
                                  THEN 1 ELSE 0 END
                   END AS d
            FROM masked a JOIN masked b ON a.mkey = b.mkey AND a.id < b.id
        ), grp AS (
            SELECT d, len, CAST(COUNT(*) AS BIGINT) AS occ
            FROM occ WHERE d BETWEEN 1 AND {_MAX_HAMMING}
            GROUP BY d, len
        )
        SELECT CAST(d AS BIGINT) AS hamming_d,
               CAST(SUM(CASE WHEN d = 1 THEN occ // GREATEST(v - 1, 1)
                             ELSE occ END) AS BIGINT) AS n_pairs
        FROM grp JOIN vcnt USING (len)
        GROUP BY d
    """,
    tags=("dedup", "similarity", "blocking"),
)
def dedup_hamming_pairs(spark, sf_dir):
    """Same-length name pairs within Hamming distance 2, counted per
    distance. The oracle REPLAYS the masked-neighborhood scheme (the
    O(n^2) theta join is sf1-infeasible in DuckDB); independent
    ground truths live in dedup_hamming_bruteforce_guard (driver-run
    brute-force oracle on a capped subset, every round) and the pytest
    losslessness/hypothesis checks. The engine generates candidates by
    masked-neighborhood blocking over
    VARYING positions only: a (length, position) is varying when the
    corpus shows more than one character there — a 1-row-per-(len,pos)
    control-plane profile — and two same-length names can mismatch
    only at varying positions, so masks over varying-position pairs
    remain lossless while skipping every wildcard wasted on the
    template's constant region ('Customer#' + leading zeros: ~6
    varying digits of 18 chars, a ~10x emission cut that grows with
    corpus templating). Masks wildcard each pair of varying positions
    (the single varying position, when only one varies), and a
    qualifying pair collides on the key masked exactly at its mismatch
    positions (mask sets are supersets of the <=2 mismatch positions).
    The masked string keeps every other high-entropy character in the
    join key, so bucket sizes follow the data's true ambiguity, not
    its template (segment-pigeonhole blocking degenerates to a cross
    product on templated keys). Two more candidate-side savings: a
    pair joined on mask (i, j) can mismatch ONLY at i or j, so d is
    two char-compares (not an L-step scan); and instead of
    de-duplicating the candidate pair multiset (a d=1 pair collides in
    exactly V-1 varying-pair masks, a d=2 pair in exactly 1),
    occurrences are counted and divided by that known multiplicity —
    no pair-keyed shuffle at all."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    return _hamming_masked_pairs(spark, c)


def _hamming_masked_pairs(spark, c):
    """The masked-neighborhood Hamming pipeline over (id, name) — shared
    by dedup_hamming_pairs (full corpus, replay oracle) and
    dedup_hamming_bruteforce_guard (bounded subset, independent O(n^2)
    oracle), so the guarded entry exercises the production code path."""
    # control-plane profile: varying positions per length class
    # (bounded by #length-classes x max length — tens of rows)
    stats = (
        c.select(
            F.length("name").alias("len"),
            F.explode(F.expr("sequence(1, length(name))")).alias("p"),
            "name",
        )
        .select("len", "p", F.expr("substring(name, p, 1)").alias("ch"))
        .groupBy("len", "p")
        .agg(F.countDistinct("ch").alias("nc"))
        .collect()
    )
    vpos: dict[int, list[int]] = {}
    for r in stats:
        if r["nc"] > 1:
            vpos.setdefault(r["len"], []).append(r["p"])
    spec = []
    for length, ps in sorted(vpos.items()):
        ps.sort()
        if len(ps) == 1:
            spec.append((length, ps[0], ps[0]))
        else:
            spec.extend(
                (length, ps[x], ps[y])
                for x in range(len(ps))
                for y in range(x + 1, len(ps))
            )
    if not spec:  # every same-length pair is identical: no d in [1,2]
        return spark.createDataFrame([], "hamming_d long, n_pairs long")
    spec_df = spark.createDataFrame(spec, "len int, i int, j int")
    div_df = spark.createDataFrame(
        [(length, max(len(ps) - 1, 1)) for length, ps in sorted(vpos.items())],
        "len int, div1 long",
    )
    mkey = F.when(
        F.col("i") == F.col("j"),
        F.expr(
            "concat(substring(name, 1, i - 1), '*',"
            " substring(name, i + 1, len - i))"
        ),
    ).otherwise(
        F.expr(
            "concat(substring(name, 1, i - 1), '*',"
            " substring(name, i + 1, j - i - 1), '*',"
            " substring(name, j + 1, len - j))"
        )
    )
    # spread the byte-small scan (single row group at bench scale; no-op
    # on split inputs) and materialize the masked explosion ONCE — it
    # feeds both sides of the mkey self-join, and each side was
    # re-running the x|spec| explode + string builds (r14)
    from ..tables import parallelize_scan

    masked = (
        parallelize_scan(c)
        .withColumn("len", F.length("name"))
        .join(F.broadcast(spec_df), "len")
        .select("id", "name", "len", "i", "j", mkey.alias("mkey"))
        .localCheckpoint(eager=False)
    )
    a = masked.select(
        F.col("id").alias("ai"), F.col("name").alias("an"), "len", "i", "j", "mkey"
    )
    bb = masked.select(F.col("id").alias("bi"), F.col("name").alias("bn"), "mkey")
    di = F.expr(
        "CASE WHEN substring(an, i, 1) <> substring(bn, i, 1) THEN 1 ELSE 0 END"
    )
    dj = F.expr(
        "CASE WHEN substring(an, j, 1) <> substring(bn, j, 1) THEN 1 ELSE 0 END"
    )
    d = F.when(F.col("i") == F.col("j"), di).otherwise(di + dj)
    occ = (
        a.join(bb, "mkey")
        .filter(F.col("ai") < F.col("bi"))
        .select(d.alias("d"), "len")
        .filter(F.col("d").between(1, _MAX_HAMMING))
        .groupBy("d", "len")
        .agg(F.count("*").alias("occ"))
    )
    return (
        occ.join(F.broadcast(div_df), "len")
        .select(
            F.col("d").cast("long").alias("hamming_d"),
            F.when(F.col("d") == 1, F.expr("occ DIV div1"))
            .otherwise(F.col("occ"))
            .cast("long")
            .alias("n_pairs"),
        )
        .groupBy("hamming_d")
        .agg(F.sum("n_pairs").cast("long").alias("n_pairs"))
    )


_GUARD_MAX_CUSTKEY = 3000


@register(
    "dedup_hamming_bruteforce_guard",
    # INDEPENDENT ground truth: the oracle is the exact O(n^2)
    # length-blocked theta join — it shares NO algorithmic structure
    # with the engine's masked-neighborhood blocking, so a shared
    # blocking/multiplicity bug cannot pass (the r6 advisor's
    # independence concern about the full-corpus entry's replay
    # oracle). Feasible at every SF because the subset is capped at a
    # CONSTANT (c_custkey <= 3000): at the sf0.01 driver gate the
    # subset IS the whole customer table, so the driver retains one
    # full-strength independent Hamming check each round; at sf1 the
    # theta join stays ~4.5M row pairs.
    oracle=f"""
        WITH c AS (
            SELECT c_custkey AS id, c_name AS name,
                   CAST(length(c_name) AS INTEGER) AS len
            FROM customer WHERE c_custkey <= {_GUARD_MAX_CUSTKEY}
        ), d AS (
            SELECT list_sum(list_transform(range(1, a.len + 1),
                       p -> CASE WHEN substr(a.name, CAST(p AS INTEGER), 1)
                                      <> substr(b.name, CAST(p AS INTEGER), 1)
                                 THEN 1 ELSE 0 END)) AS d
            FROM c a JOIN c b ON a.len = b.len AND a.id < b.id
        )
        SELECT CAST(d AS BIGINT) AS hamming_d,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM d WHERE d BETWEEN 1 AND {_MAX_HAMMING} GROUP BY d
    """,
    tags=("dedup", "similarity", "blocking", "guard"),
)
def dedup_hamming_bruteforce_guard(spark, sf_dir):
    """Independence guard for the masked-neighborhood Hamming path: the
    engine runs the PRODUCTION pipeline (_hamming_masked_pairs, same
    code as dedup_hamming_pairs) on the c_custkey <= 3000 subset; the
    oracle recomputes the answer with the brute-force theta join. Any
    losslessness or multiplicity-division bug in the blocking scheme
    goes red here even though the full-corpus entry's oracle replays
    the scheme (which it must, to stay sf1-feasible)."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= _GUARD_MAX_CUSTKEY)
        .select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))
    )
    return _hamming_masked_pairs(spark, c)


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
