"""Deduplication operators (SURVEY §2.11 M1-M3 + training-data dedup).

The reference runs a 3-tier dedup (exact SHA-256, TF-IDF cosine vs the
last 100 texts, embedding cosine vs the last 50) as a driver-side loop
with order-dependent caches (reference:
src/spark_consumers/deduplication_consumer.py:107-286). A distributed
engine needs deterministic, order-free semantics (SURVEY §7.4 #1):
candidates come from *blocking* (not arrival order), the canonical
record of a duplicate group is the lowest id, and every tier is a
DataFrame plan.

Scale design:
- exact tier: hash + groupBy — one shuffle on the 16-byte hash;
- n-gram Jaccard: blocked self-join (equi-join on block keys, so the
  pair space is per-block, never full-corpus O(n^2));
- MinHash-LSH: signature = array of per-permutation mins computed as
  column expressions (xxhash64 — JVM-side, no Python); banding turns
  near-dup search into equi-joins on band keys; candidates verified
  with exact Jaccard;
- SimHash: 64-bit signature via bit-vote aggregation over token hashes,
  chunk-blocked Hamming candidate generation;
- embedding tier: cosine pairs within label blocks (stand-in for LSH
  buckets over real embeddings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import distinct_tokens, fingerprint, word_jaccard
from ..functions.vectors import dot, unit


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """M1: exact-duplicate groups by normalized-text hash. Returns one
    row per distinct content: (fp, canonical_id, dup_count)."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("dup_count"),
        )
    )


def _blocked_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[Column],
    payload: dict[str, Column],
) -> DataFrame:
    """Self-join on block keys producing candidate pairs (id_a < id_b).
    The equi-join on block keys is what keeps the pair space linear-ish:
    each block is small, so blocks shuffle independently and no executor
    ever sees the full corpus."""
    from ..tables import parallelize_scan

    sel = [F.col(id_col).alias("id")] + [
        c.alias(f"blk_{i}") for i, c in enumerate(block_cols)
    ] + [v.alias(k) for k, v in payload.items()]
    # payload exprs (token arrays, shingle sets) are the map-side cost of
    # the block shuffle — don't let a single-split scan serialize them
    side = parallelize_scan(df).select(*sel)
    a = side.select([F.col(c).alias(f"a_{c}") for c in side.columns])
    b = side.select([F.col(c).alias(f"b_{c}") for c in side.columns])
    cond = [F.col(f"a_blk_{i}") == F.col(f"b_blk_{i}") for i in range(len(block_cols))]
    cond.append(F.col("a_id") < F.col("b_id"))
    return a.join(b, cond)


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    chars_col: str = "n_chars",
    threshold: float = 0.7,
    char_bucket: int = 50,
) -> DataFrame:
    """M2-class n-gram (word) Jaccard near-dup pairs, blocked by
    (source, length bucket). Returns (id_a, id_b, jaccard)."""
    pairs = _blocked_pairs(
        df,
        id_col,
        [F.col(source_col), F.floor(F.col(chars_col) / F.lit(char_bucket))],
        {"tok": distinct_tokens(F.col(text_col))},
    )
    j = word_jaccard(F.col("a_tok"), F.col("b_tok"))
    return (
        pairs.select(
            F.col("a_id").alias("id_a"),
            F.col("b_id").alias("id_b"),
            F.round(j, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_gemm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    chars_col: str = "n_chars",
    threshold: float = 0.7,
    char_bucket: int = 50,
) -> DataFrame:
    """jaccard_pairs via per-block binary GEMM (applyInPandas).

    Same blocking and output contract as jaccard_pairs; the pair work
    runs as one matrix multiply per block: rows = docs, columns = the
    block's token vocabulary, intersections = B @ B.T, unions from row
    sums. Each doc's text crosses the wire once instead of once per
    candidate pair (the measured cost of the join formulation — see
    knn_per_block_gemm). Tokenization mirrors functions.text_funcs.tokens
    exactly: lower, split on single spaces, drop empties, distinct.
    """
    schema = "id_a long, id_b long, jaccard double"

    def block_pairs(pdf):  # closure: executors don't import this repo
        import numpy as np
        import pandas as _pd

        empty = _pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        m = len(pdf)
        if m < 2:
            return empty
        ids = pdf[id_col].to_numpy()
        token_sets = [
            frozenset(t for t in (s or "").lower().split(" ") if t)
            for s in pdf[text_col]
        ]
        vocab = {}
        for ts in token_sets:
            for t in ts:
                vocab.setdefault(t, len(vocab))
        if not vocab:
            return empty
        B = np.zeros((m, len(vocab)), dtype=np.float32)
        for i, ts in enumerate(token_sets):
            for t in ts:
                B[i, vocab[t]] = 1.0
        # counts are small integers — exact in float32 GEMM — but the
        # division and 4-decimal rounding must run in float64 or the
        # rounded values carry float32 noise (0.8333 -> 0.83329999...)
        inter = (B @ B.T).astype(np.float64)
        sizes = inter.diagonal()
        union = sizes[:, None] + sizes[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            J = np.round(np.where(union > 0, inter / union, np.nan), 4)
        ia, ib = np.where(J >= threshold)
        keep = ids[ia] < ids[ib]
        return _pd.DataFrame(
            {
                "id_a": ids[ia][keep],
                "id_b": ids[ib][keep],
                "jaccard": J[ia, ib][keep],
            }
        )

    blocked = df.select(
        F.col(id_col),
        F.col(text_col),
        F.col(source_col).alias("__blk_src"),
        F.floor(F.col(chars_col) / F.lit(char_bucket)).alias("__blk_len"),
    )
    # explicit block-key repartition before the groupBy — same AQE-
    # coalescing guard as embedding_cosine_pairs_gemm (see there): the
    # per-block GEMM is quadratic in rows, so byte-based partition
    # coalescing starves it
    spread = df.sparkSession.sparkContext.defaultParallelism
    return (
        blocked.repartition(spread, "__blk_src", "__blk_len")
        .groupBy("__blk_src", "__blk_len")
        .applyInPandas(block_pairs, schema)
    )


# Banding/chunk layout constants — the SINGLE definition shared by the
# production pair operators below and the certification queries
# (queries/dedup_q.py dedup_minhash_lsh / dedup_simhash), which replay
# the same banding over distinct token sets. Importing from here (and
# building band hashes through the helpers below) keeps certification
# and production from drifting if the layout ever changes.
MINHASH_N_PERM = 32
MINHASH_BANDS = 8
SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4

# connected_components small-graph cap: an edge list at or under this
# many (directed) rows is labeled driver-side in one collect (~3 MB of
# long pairs — the broadcast-relation size class) instead of running
# the multi-round distributed loop. Larger graphs take the loop.
SMALL_GRAPH_EDGES = 200_000


def minhash_band_hashes(
    sig_col: str = "sig", n_perm: int = MINHASH_N_PERM, bands: int = MINHASH_BANDS
) -> list[Column]:
    """One Column per band: xxhash64 over that band's signature slots.
    Bucket collision <=> band-hash equality, so this is both the
    production bucket key and the certification's hit predicate."""
    rows_per_band = n_perm // bands
    return [
        F.xxhash64(*[F.col(sig_col)[b * rows_per_band + r] for r in range(rows_per_band)])
        for b in range(bands)
    ]


def simhash_chunk_structs(
    sig_col: str = "sig", bits: int = SIMHASH_BITS, chunks: int = SIMHASH_CHUNKS
) -> list[Column]:
    """struct(chunk, ckey) per 16-bit signature chunk — the blocking
    key layout shared by simhash_pairs and its certification."""
    chunk_bits = bits // chunks
    mask = (1 << chunk_bits) - 1
    return [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright(F.col(sig_col), c * chunk_bits)
            .bitwiseAND(F.lit(mask))
            .alias("ckey"),
        )
        for c in range(chunks)
    ]


def minhash_signature(tokens_col: Column, n_perm: int = MINHASH_N_PERM) -> Column:
    """MinHash signature as an array<long>: perm i = min over tokens of
    xxhash64(token, seed=i). Pure column expressions — the whole
    signature computes inside codegen, no Python, no ML-pipeline
    intermediate DataFrames."""
    def perm(i):
        # single-param lambda: a 2-param lambda would receive the array
        # INDEX as its second argument (higher-order-function contract)
        return lambda t: F.xxhash64(t, F.lit(i))

    return F.array(*[F.array_min(F.transform(tokens_col, perm(i))) for i in range(n_perm)])


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = MINHASH_N_PERM,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.7,
) -> DataFrame:
    """M2: MinHash-LSH near-dup detection. shingle -> minhash -> band ->
    bucket-join -> verify. With 32 perms in 8 bands of 4, pairs with
    Jaccard 0.7 collide in >=1 band w.p. ~0.97; all candidates are then
    verified with exact Jaccard so the output has no false positives.
    Returns (id_a, id_b, jaccard) — same contract as jaccard_pairs.

    Scale path: signatures are fixed-width (n_perm longs) regardless of
    doc size; each band bucket-join is an equi-join on (band, hash) so
    the shuffle key space is uniform unless the corpus is degenerate.
    """
    toks = distinct_tokens(F.col(text_col))
    sigs = df.select(
        F.col(id_col).alias("id"),
        toks.alias("tok"),
        minhash_signature(toks, n_perm).alias("sig"),
    )
    # the band join and candidate dedup run on BARE (band, bucket, id)
    # rows — carrying the token arrays here would ship every document's
    # token set through the shuffle once per band (8x) and again through
    # the pair dedup; instead tokens attach once per DISTINCT candidate
    # pair afterward (2 narrow joins back to the signature table).
    # Measured at sf0.1: 258 s -> ~80 s, identical output.
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), h.alias("bucket"))
                    for b, h in enumerate(minhash_band_hashes("sig", n_perm, bands))
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.select("band", "bucket", F.col("id").alias("id_a"))
    b = banded.select("band", "bucket", F.col("id").alias("id_b"))
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    toks_only = sigs.select("id", "tok")
    paired = (
        cand.join(toks_only.select(F.col("id").alias("id_a"), F.col("tok").alias("tok_a")), "id_a")
        .join(toks_only.select(F.col("id").alias("id_b"), F.col("tok").alias("tok_b")), "id_b")
    )
    j = word_jaccard(F.col("tok_a"), F.col("tok_b"))
    return paired.select(
        "id_a", "id_b", F.round(j, 4).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    fixed_steps: int | None = None,
) -> DataFrame:
    """Duplicate GROUPS from near-dup pairs: iterative minimum-label
    propagation (the standard large-graph connected-components loop,
    also what GraphFrames runs). Each member resolves to the smallest
    doc id reachable through the pair graph — the deterministic
    "canonical = first id of the similarity group" semantics SURVEY
    §7.4 #1 requires in place of the reference's arrival-order caches.

    Pair lists are quadratic on templated corpora; groups are the
    scale-honest dedup contract (one row per member, size bounded by the
    corpus). Each materialization is two edge-propagation steps plus one
    pointer-jumping compression (labels chase their label's label), so
    the materialization count is O(log diameter) — near-dup graphs are
    NOT always cliques (the bench corpus measured diameter 7 at sf0.1,
    chain-shaped templated text), and log-depth is what survives when
    chains grow with the corpus. Returns (doc_id, canonical_id).

    ``fixed_steps``: pin the body to exactly N pure propagation steps
    with NO per-block convergence probes, then assert convergence ONCE
    with a single verification step afterwards. Only for corpora whose
    diameter is KNOWN a priori; a graph needing more hops raises
    instead of returning under-merged groups (and the sf0.1 bench
    corpus proved such assumptions wrong once already — prefer the
    adaptive loop unless the bound is structural).

    Small-graph fast path (r13): one limit-bounded count probes the
    edge list; at or under ``SMALL_GRAPH_EDGES`` rows the labeling runs
    as ONE capped collect + driver union-find (the broadcast-join
    device: a bounded driver materialization replacing a multi-round
    shuffle plan — the cap is ~3 MB of id pairs, far under any
    broadcast threshold). Each adaptive-loop materialization costs 2-3
    scheduler rounds regardless of graph size, so a small graph paid
    ~10 rounds of pure overhead (measured r13: 4.5 s of
    dedup_duplicate_groups' 4.65 s warm time). Above the cap the
    distributed loop runs exactly as before — the 100 TB shape is
    unchanged, and the probe itself is one cheap job on the cached
    edge list. Identical labels: union-find with min-root union is
    order-independent and yields the component minimum.
    """
    # LAZY checkpoints (r13): every block's convergence probe is an
    # action anyway, so eager=False lets the probe job materialize the
    # checkpoint it reads — the previous eager=True paid one whole
    # Spark job per checkpoint (2 upfront + 1 per block) purely to
    # materialize ahead of the probe. Lineage truncation is identical:
    # the lazy checkpoint already replaces the logical plan.
    # (An explicit repartition(defaultParallelism, "s") before this
    # checkpoint was A/B-measured on the r14 12M-edge geo graph and
    # REJECTED: the up-front shuffle of the doubled edge list cost more
    # than the loop won back at this scale, and at 100 TB the edge list
    # arrives from wide scans with natural partitioning anyway.)
    edges = (
        pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
        .unionByName(pairs.select(F.col(id_b).alias("s"), F.col(id_a).alias("d")))
        .localCheckpoint(eager=False)
    )

    # --- small-graph fast path: capped collect + driver union-find ---
    # (adaptive mode only: a fixed_steps caller asked for the pinned
    # distributed body and its convergence assert verbatim)
    if fixed_steps is None:
        # ONE capped Arrow action serves as both the size probe and the
        # edge fetch (r13: the previous limit().count() probe executed
        # the whole upstream pair join as a separate job, and the
        # follow-up collect() paid per-Row object conversion — together
        # ~0.7s of dedup_duplicate_groups' warm time at sf0.1). The
        # limit bounds the driver transfer at ~3 MB of long pairs
        # regardless of graph size; over the cap the partial result is
        # discarded and the distributed loop below runs as before.
        head = edges.limit(SMALL_GRAPH_EDGES + 1).toArrow()
        if head.num_rows <= SMALL_GRAPH_EDGES:
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for a, b in zip(
                head.column("s").to_pylist(), head.column("d").to_pylist()
            ):
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)  # min-label union
            import pandas as pd

            nodes = sorted(parent)
            out = pd.DataFrame(
                {
                    "doc_id": pd.Series(nodes, dtype="int64"),
                    "canonical_id": pd.Series(
                        [find(n) for n in nodes], dtype="int64"
                    ),
                }
            )
            return pairs.sparkSession.createDataFrame(
                out, "doc_id long, canonical_id long"
            )

    # --- distributed loop: the 100 TB shape, unchanged ---
    # localCheckpoint per block truncates lineage — without it the
    # plan doubles every round (each labels embeds the previous one) and
    # the driver OOMs on graphs needing more than a few hops
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=False)
    )

    def step(lbl):
        msgs = edges.join(lbl, edges["s"] == lbl["node"]).select(
            F.col("d").alias("node"), "comp"
        )
        return (
            lbl.unionByName(msgs).groupBy("node").agg(F.min("comp").alias("comp"))
        )

    def compress(lbl):
        # pointer jumping: comp <- label[comp]. Every comp value is
        # itself a node id (labels start as ids and only min-combine),
        # so one self-join halves the remaining pointer-chain depth —
        # propagate+compress converges in O(log d) materializations
        # where plain propagation needs O(d). The bench corpus measured
        # d=7 at sf0.1 (chain-shaped near-dup components, NOT cliques —
        # the r5 'diameter <= 2' premise was wrong at 10x), and d grows
        # with corpus size on templated text; log-depth is the shape
        # that survives 100 TB.
        m = lbl.select(F.col("node").alias("cnode"), F.col("comp").alias("ccomp"))
        return lbl.join(m, lbl["comp"] == m["cnode"], "left").select(
            "node",
            F.least(
                F.col("comp"), F.coalesce(F.col("ccomp"), F.col("comp"))
            ).alias("comp"),
        )

    if fixed_steps is not None:
        lbl = labels
        for i in range(fixed_steps):
            lbl = step(lbl)
            if i % 2 == 1 or i == fixed_steps - 1:
                lbl = lbl.localCheckpoint(eager=False)
        labels = lbl
        before = labels.agg(F.sum("comp")).collect()[0][0]
        after = step(labels).agg(F.sum("comp")).collect()[0][0]
        if before != after:
            raise RuntimeError(
                f"connected_components: min-label propagation not converged "
                f"after the pinned {fixed_steps} steps (graph diameter "
                f"exceeds the pin); raise fixed_steps or drop the pin"
            )
        return labels.select(
            F.col("node").alias("doc_id"), F.col("comp").alias("canonical_id")
        )

    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    converged = False
    steps_done = 0
    while steps_done < max_iter:
        # THREE propagation steps + ONE pointer-jump per
        # materialization, then a convergence probe. The probe-per-block
        # (not per-step) cadence bounds driver round-trips — the
        # measured source of the bench run-to-run swing (r5 verdict #2)
        # — and the pointer jump makes the block count O(log d). Block
        # size 3 was A/B'd against 2 on the bench graph (sf0.1, d=7):
        # one fewer materialization round, 3.9s -> 3.3s, identical
        # groups; the cost of a bigger block is only extra no-op steps
        # in the final confirming block. Labels only decrease, so an
        # unchanged sum across a whole block implies every operation in
        # it was a no-op (fixpoint: at convergence label[label[x]] ==
        # label[x], so compression is also a no-op).
        block = min(3, max_iter - steps_done)
        lbl = labels
        for _ in range(block):
            lbl = step(lbl)
        # lazy: the probe right below materializes this checkpoint in
        # the SAME job it reads the sum from (one job per block, not two)
        labels = compress(lbl).localCheckpoint(eager=False)
        steps_done += block
        new_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # Labels only decrease, so a still-shrinking sum at the cap means
        # components that should merge are still split — fail loudly
        # instead of returning silently-wrong groups on chain graphs.
        raise RuntimeError(
            f"connected_components: min-label propagation did not converge "
            f"within {max_iter} iterations (graph diameter exceeds the cap); "
            f"raise max_iter"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("comp").alias("canonical_id"))


def simhash_signature_sql(hashes_expr: str, bits: int = 64) -> str:
    """SimHash as ONE SQL expression string over `hashes_expr` (the SQL
    text of an array<long> of token hashes): for each bit b, vote +1/-1
    by whether bit b is set across token hashes; signature bit b =
    (vote > 0); result is a long.

    A string, not Column objects (r14, the r13 k-means Py4J-chatter
    fix): the previous 64-iteration Column build — an aggregate lambda,
    a when-chain and a bitwise OR per bit — cost ~8-9 s of driver
    round trips PER CALL (dedup_simhash's entire build phase); one
    parsed expression costs ~0.2 s. Every operation is exact 64-bit
    integer arithmetic, so the computed signatures are identical by
    construction (pinned by the existing known-signature tests)."""
    bit_terms = []
    for b in range(bits):
        vote = (
            f"aggregate({hashes_expr}, CAST(0 AS BIGINT), (acc, h) ->"
            f" acc + (CASE WHEN (shiftright(h, {b}) & 1) = 1"
            f" THEN 1 ELSE -1 END))"
        )
        # set bit b via shiftleft (2**63 would overflow a literal;
        # shifting keeps it in Java long arithmetic)
        bit_terms.append(
            f"(CASE WHEN {vote} > 0 THEN shiftleft(CAST(1 AS BIGINT), {b})"
            f" ELSE CAST(0 AS BIGINT) END)"
        )
    return "CAST(0 AS BIGINT) | " + " | ".join(bit_terms)


def simhash_signature(hashes_expr: str, bits: int = 64) -> Column:
    """simhash_signature_sql as a Column. Takes the SQL TEXT of the
    hashes expression (e.g. "transform(tok, t -> xxhash64(t))"), not a
    Column — see simhash_signature_sql for why."""
    return F.expr(simhash_signature_sql(hashes_expr, bits))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
    max_hamming: int = 8,
) -> DataFrame:
    """M2/M3-class SimHash near-dup pairs. Blocking: split the 64-bit
    signature into (max_hamming/16+1... practical: 4) 16-bit chunks —
    pairs within Hamming<=max_hamming must agree on >=1 chunk when
    max_hamming < 4*? (pigeonhole holds for max_hamming <= 3 with 4
    chunks; larger budgets trade recall). Candidates verified with the
    true Hamming distance. Returns (id_a, id_b, hamming)."""
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(distinct_tokens(F.col(text_col)), lambda t: F.xxhash64(t)).alias("th"),
    )
    sigs = hashed.select("id", simhash_signature("th", bits).alias("sig"))
    banded = sigs.select(
        "id",
        "sig",
        F.explode(F.array(*simhash_chunk_structs("sig", bits))).alias("cc"),
    ).select("id", "sig", "cc.chunk", "cc.ckey")
    a = banded.select("chunk", "ckey", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = banded.select("chunk", "ckey", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    cand = (
        a.join(b, ["chunk", "ckey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.select("id_a", "id_b", hamming.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.35,
) -> DataFrame:
    """M3: embedding-cosine near-dup pairs within blocks. The block
    column stands in for an LSH bucket (BucketedRandomProjectionLSH
    would generate it for unblocked corpora). Returns
    (id_a, id_b, cosine_sim)."""
    side = emb.select(
        F.col(id_col).alias("id"), F.col(block_col).alias("blk"), unit(F.col(vec_col)).alias("v")
    )
    a = side.select(F.col("id").alias("id_a"), F.col("blk"), F.col("v").alias("v_a"))
    b = side.select(F.col("id").alias("id_b"), F.col("blk"), F.col("v").alias("v_b"))
    pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    sim = dot(F.col("v_a"), F.col("v_b"))
    return pairs.select(
        "id_a", "id_b", F.round(sim, 4).alias("cosine_sim")
    ).filter(F.col("cosine_sim") >= threshold)


def embedding_cosine_pairs_gemm(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.35,
    chunk: int = 4096,
) -> DataFrame:
    """embedding_cosine_pairs via per-block numpy GEMM (applyInPandas)
    — the production kernel; the expression variant above is its
    verification twin (equality pinned in tests/test_dedup.py, the same
    device as langid_trigram_fast / knn_per_block_gemm).

    Why: the expression path materializes BOTH 64-dim arrays through
    the within-block join output and evaluates an interpreted
    zip_with/aggregate per candidate pair — at sf1 that is ~20M pair
    rows x 64 elements dominating the audit tail. Here each vector
    crosses the wire ONCE (Arrow), the pair work is one BLAS matmul per
    row-chunk, and only >= threshold pairs are emitted (output-sized,
    not candidate-sized). Same contract: ids sorted so id_a < id_b,
    cosine rounded to 4 BEFORE the threshold compare.

    Scale: one task per block; chunked GEMM bounds peak memory at
    chunk x m without changing results. Blocks beyond single-task
    memory shard through the blocked expression variant.
    """
    schema = "id_a long, id_b long, cosine_sim double"

    def pairs_block(pdf):  # closure: executors don't import this repo
        import numpy as np
        import pandas as _pd

        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        m = len(ids)
        if m < 2:
            return _pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        M /= norms
        out_a, out_b, out_s = [], [], []
        for lo in range(0, m, chunk):
            hi = min(lo + chunk, m)
            S = np.round(M[lo:hi] @ M.T, 4)
            # strict upper order by ID, not position: a block holding
            # duplicate vec_ids must not emit an id_a == id_b pair (the
            # expression twin's id_a < id_b filter drops those)
            r, c = np.nonzero(S >= threshold)
            keep = ids[c] > ids[r + lo]
            r, c = r[keep], c[keep]
            out_a.extend(ids[r + lo])
            out_b.extend(ids[c])
            out_s.extend(S[r, c])
        return _pd.DataFrame(
            {"id_a": out_a, "id_b": out_b, "cosine_sim": out_s}
        )

    # explicit repartition on the block key (r13): groupBy satisfies its
    # clustered-distribution requirement from this user-specified hash
    # partitioning (no second exchange), and — unlike the groupBy's own
    # exchange — AQE's byte-based coalescing leaves it alone. Without it
    # a small-BYTES block frame coalesces to 1-2 partitions while each
    # block's GEMM is quadratic in rows (measured sf0.1: the 5-cluster
    # semdedup pair stage ran 2 tasks, 0.52s, on 32 idle cores).
    spread = emb.sparkSession.sparkContext.defaultParallelism
    return (
        emb.select(id_col, block_col, vec_col)
        .repartition(spread, block_col)
        .groupBy(block_col)
        .applyInPandas(pairs_block, schema)
    )


def minhash_md5_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """M2 (oracle-replayable tier): MinHash-LSH whose hash family is
    md5-derived — ``conv(substr(md5(seed || ':' || token),1,15),16,10)``
    — which DuckDB reproduces bit-for-bit, so the ENTIRE pipeline
    (signatures, banding, candidate join, exact-Jaccard verify) is
    SQL-checkable end to end. The xxhash64 variant (minhash_lsh_pairs)
    stays the throughput path; this one is the correctness witness for
    the same algorithm.

    Shape: tokens explode once; the 16 per-seed hashes are parallel
    column expressions over the exploded rows (each token hashed once
    per seed — no per-seed re-tokenization); signature = groupBy min;
    bands = fixed concat of signature slots; candidates = equi-join on
    (band, band_signature); every candidate is exact-verified, so no
    false positives survive.
    """
    toks, banded = _md5_bands(df, text_col, id_col, n_hashes, bands)
    a = banded.select("band", "bsig", F.col("id").alias("id_a"))
    b = banded.select("band", "bsig", F.col("id").alias("id_b"))
    cand = (
        a.join(b, ["band", "bsig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_pairs(cand, toks, threshold)


def _md5_bands(df, text_col, id_col, n_hashes, bands):
    """Shared MinHash-md5 band builder: (toks, banded) where banded is
    (id, band, bsig). Used by the self-join pair path and the
    incremental new-vs-existing cross path."""
    rows_per_band = n_hashes // bands
    toks = df.select(
        F.col(id_col).alias("id"), distinct_tokens(F.col(text_col)).alias("tok")
    )
    tok_rows = toks.select("id", F.explode("tok").alias("t"))
    # vocab-sized hashing: each (seed, token) md5 computed once over the
    # distinct vocabulary and joined back — not once per (doc, token)
    # row (see setsim.md5_token_vocab_hashes; bit-identical values)
    from .setsim import md5_token_vocab_hashes

    hashed = tok_rows.join(
        md5_token_vocab_hashes(
            tok_rows, "t", [(f"h{s}", f"{s}:") for s in range(n_hashes)]
        ),
        "t",
    )
    sig = hashed.groupBy("id").agg(
        *[F.min(f"h{s}").alias(f"mh{s}") for s in range(n_hashes)]
    )
    # bare-id band join + distinct, tokens re-attached per candidate
    # pair — same array-payload-off-the-shuffle device as
    # minhash_lsh_pairs (measured there: ~10x at sf0.1)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"mh{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bsig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bsig")
    return toks, banded


def _verify_pairs(cand, toks, threshold):
    """Exact-Jaccard verification of bare-id candidate pairs (tokens
    re-attached per pair, never shipped through the band shuffle)."""
    paired = cand.join(
        toks.select(F.col("id").alias("id_a"), F.col("tok").alias("tok_a")), "id_a"
    ).join(
        toks.select(F.col("id").alias("id_b"), F.col("tok").alias("tok_b")), "id_b"
    )
    j = word_jaccard(F.col("tok_a"), F.col("tok_b"))
    return paired.select("id_a", "id_b", F.round(j, 4).alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def minhash_md5_incremental_pairs(
    new_df: DataFrame,
    old_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Incremental-ingest dedup: near-dup pairs between a NEW batch and
    the EXISTING corpus only — the band join probes new-side signatures
    against old-side signatures, so no old x old (already deduped) or
    new x new (the batch self-dedup is a separate, tiny call) work is
    ever done. At 100 TB the old side's band table is a precomputed
    artifact maintained at ingest (like the IVF centroids), so each
    arriving batch costs hash(batch) + one equi-join against it.
    Returns (id_a=new, id_b=old, jaccard)."""
    toks_n, banded_n = _md5_bands(new_df, text_col, id_col, n_hashes, bands)
    toks_o, banded_o = _md5_bands(old_df, text_col, id_col, n_hashes, bands)
    cand = (
        banded_n.select("band", "bsig", F.col("id").alias("id_a"))
        .join(
            banded_o.select("band", "bsig", F.col("id").alias("id_b")),
            ["band", "bsig"],
        )
        .select("id_a", "id_b")
        .distinct()
    )
    toks = toks_n.unionByName(toks_o)
    return _verify_pairs(cand, toks, threshold)


def simhash_md5_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 48,
    chunk_bits: int = 16,
    max_hamming: int = 8,
) -> DataFrame:
    """M2 (oracle-replayable tier): SimHash whose per-token hashes are
    md5-derived, so signatures, chunk blocking, and Hamming verify all
    replay bit-for-bit in DuckDB (the xxhash64 simhash_pairs stays the
    throughput path). 48-bit signature (top bit headroom keeps every
    intermediate a positive BIGINT in both engines), 3x16-bit chunk
    blocking: pairs within Hamming distance 2 are guaranteed a shared
    chunk (pigeonhole); beyond that recall is partial and documented —
    identical trade to the fast path.

    Shape: tokens explode once; the 48 per-bit votes are parallel
    conditional sums in ONE groupBy (no per-bit re-scan); the signature
    reassembles with shiftleft; candidates come from a 3-way chunk
    equi-join, verified by bit_count(xor).
    """
    n_chunks = n_bits // chunk_bits
    toks = df.select(
        F.col(id_col).alias("id"), distinct_tokens(F.col(text_col)).alias("tok")
    )
    tok_rows = toks.select("id", F.explode("tok").alias("t"))
    # vocab-sized hashing: the "sim:" md5 runs once per distinct token,
    # joined back to the occurrence rows (bit-identical values)
    from .setsim import md5_token_vocab_hashes

    hashed = tok_rows.join(
        md5_token_vocab_hashes(tok_rows, "t", [("h", "sim:")]), "t"
    ).select("id", "h")
    votes = hashed.groupBy("id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), b) % 2).alias(f"ones{b}")
            for b in range(n_bits)
        ],
    )
    sig = votes.select(
        "id",
        sum(
            [
                F.when(
                    2 * F.col(f"ones{b}") > F.col("n"),
                    F.shiftleft(F.lit(1).cast("long"), b),
                ).otherwise(F.lit(0).cast("long"))
                for b in range(n_bits)
            ],
            F.lit(0).cast("long"),
        ).alias("sig"),
    )
    chunked = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        (
                            F.shiftright(F.col("sig"), c * chunk_bits)
                            % (1 << chunk_bits)
                        ).alias("chunk"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("cc"),
    ).select("id", "sig", "cc.c", "cc.chunk")
    a = chunked.select(
        "c", "chunk", F.col("id").alias("id_a"), F.col("sig").alias("sig_a")
    )
    b = chunked.select(
        "c", "chunk", F.col("id").alias("id_b"), F.col("sig").alias("sig_b")
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    # Hamming filter BEFORE the pair dedup (r12 sf1 profile): the
    # filter is map-side xor+popcount while dropDuplicates is a shuffle
    # of every candidate, so filter-first never loses and wins big when
    # most candidates fail the cut. Value-identical: duplicate
    # candidate rows of a pair carry identical sigs, so dedup-then-
    # filter == filter-then-dedup. (On THIS corpus 97% of candidates
    # pass — 260.4M of 268.6M at sf1 — so the A/B was a tie, 89.9s vs
    # 90.1s warm; the reorder is kept for the general corpus where the
    # Hamming cut, not blocking, does the work. Stage table: SCALE.md
    # "dedup_simhash_md5 measured floor".)
    return (
        a.join(b, ["c", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(ham <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", ham.cast("long").alias("hamming"))
    )
