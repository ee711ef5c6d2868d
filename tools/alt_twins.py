"""Dual-plan sf1 value proofs for the exact-DBSCAN audit tier.

Three registry rows (`cluster_grid_dbscan`, `cluster_dbscan_jittered`,
`cluster_geo_pipeline`) have DuckDB oracles that are genuinely
sf1-infeasible: the recursive connected-components CTE over the ~47M-edge
eps-graph cannot finish even solo at a 1500s cap (r8 audit), while the
Spark side completes in 156-476s. Their VALUES at sf1 therefore rested on
sf0.1 evidence alone (r8 verdict, "What's missing" #3).

This module gives each a bounded sf1 value proof the r8 verdict
explicitly sanctions: dual-plan Spark-vs-Spark equality. Each twin
recomputes the SAME output contract with an INDEPENDENT cluster-labeling
implementation:

- the registry queries (since the r9 perf swap) label clusters through
  operators.dedup.connected_components — the pointer-jumping
  implementation whose sf1 values are independently proven
  (dedup_duplicate_groups: 555 groups exact at sf1);
- the twins label with the ORIGINAL grid_dbscan in-line neighbor-min
  propagation + path doubling loop, re-homed here verbatim
  (_label_components_inline) when production switched — plus their own
  border/noise/profile derivation written here. The r9 sf1 audit
  proved both labelers value-identical on all three queries BEFORE the
  swap (production 530/186/163s vs twin 78/29/32s), which is exactly
  the evidence that justified swapping their roles.

The eps-edge/core derivation (grid cells, 9-offset equi-join, exact
distance filter, degree >= min_samples) is shared MATH between the two
plans — it is plain non-recursive relational algebra that DuckDB value-
verifies at sf0.01/0.1 on these very queries; the recursive CC labeling
is the only part the oracle cannot check at sf1, and it is exactly the
part computed twice by algorithmically distinct code. scale_audit.py
runs registry-vs-twin full value compares and reports OK-ALTPROOF.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# tools/ is not a package; make the repo importable wherever it lives
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _eps_edges(pts: DataFrame, eps: float) -> DataFrame:
    """Exact eps-neighbor pairs (pid, qid), self-pairs included — the
    standard grid decomposition (cell join on 9 neighbor offsets +
    exact distance filter). Shared math with the production path; the
    independence this module provides is in the labeling, not here."""
    cells = pts.select(
        "pid",
        "x",
        "y",
        F.floor(F.col("x") / eps).cast("long").alias("cx"),
        F.floor(F.col("y") / eps).cast("long").alias("cy"),
    )
    probes = cells.select(
        "pid",
        "x",
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("tx"),
                        (F.col("cy") + dy).alias("ty"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("o"),
    ).select("pid", "x", "y", F.col("o.tx").alias("cx"), F.col("o.ty").alias("cy"))
    targets = cells.select(
        F.col("pid").alias("qid"),
        F.col("x").alias("qx"),
        F.col("y").alias("qy"),
        "cx",
        "cy",
    )
    d2 = (F.col("x") - F.col("qx")) ** 2 + (F.col("y") - F.col("qy")) ** 2
    return (
        probes.join(targets, ["cx", "cy"])
        .filter(d2 <= F.lit(eps * eps))
        .select("pid", "qid")
        .distinct()
    )


def _label_components_inline(core, core_edges, max_rounds: int = 20):
    """The INDEPENDENT cluster labeler: per-round neighbor-min
    propagation with pointer-jump path doubling and a changed-count
    convergence probe. This is the original grid_dbscan in-line loop,
    re-homed here verbatim when the production operator switched to
    operators.dedup.connected_components (r9: proven value-identical at
    sf0.01 and sf1, 3-7x faster) — keeping the two implementations
    algorithmically distinct is what makes the audit's dual-plan proof
    a proof. Labels start from ALL core points, so isolated cores label
    themselves. Returns (lid, cluster_id)."""
    labels = core.select(F.col("pid").alias("lid"), F.col("pid").alias("label"))
    labels = labels.localCheckpoint(eager=True)
    converged = False
    for _ in range(max_rounds):
        neighbor_min = (
            core_edges.join(labels, core_edges.qid == F.col("lid"))
            .groupBy("pid")
            .agg(F.min("label").alias("nmin"))
        )
        hopped = (
            labels.join(neighbor_min, F.col("lid") == neighbor_min.pid, "left")
            .select(
                "lid",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
        )
        # pointer jumping (path doubling): label <- label(label); labels
        # only decrease toward the component min, every jump target is
        # in the same component
        jump = hopped.select(F.col("lid").alias("jid"), F.col("label").alias("jlabel"))
        new_labels = (
            hopped.join(jump, hopped.label == jump.jid, "left")
            .select(
                "lid",
                F.least(
                    F.col("label"), F.coalesce(F.col("jlabel"), F.col("label"))
                ).alias("label"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)  # truncate lineage
        changed = (
            labels.withColumnRenamed("label", "old")
            .join(new_labels, "lid")
            .filter(F.col("old") != F.col("label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"alt twin: label propagation did not converge within "
            f"{max_rounds} rounds (core-graph diameter exceeds the cap)"
        )
    return labels.select("lid", F.col("label").alias("cluster_id"))


def dbscan_assign_cc(pts: DataFrame, eps: float, min_samples: int) -> DataFrame:
    """DBSCAN assignment (pid, cluster_id), clustered points only, with
    the cluster labeling done by the re-homed in-line propagation loop
    (_label_components_inline) instead of the production operator's
    connected_components. Label contract is identical by construction:
    cluster_id = min core pid of the component; border points take the
    min label among core neighbors; noise is dropped (the registry
    profiles filter cluster_id >= 0)."""
    edges = _eps_edges(pts, eps).localCheckpoint(eager=False)
    core = (
        edges.groupBy("pid")
        .agg(F.count("*").alias("deg"))
        .filter(F.col("deg") >= min_samples)
        .select("pid")
        .localCheckpoint(eager=False)
    )
    core_edges = (
        edges.join(core, "pid")
        .join(core.select(F.col("pid").alias("qid")), "qid")
        .filter(F.col("pid") != F.col("qid"))
    )
    core_lab = _label_components_inline(core, core_edges).select(
        F.col("lid").alias("pid"), "cluster_id"
    )
    border = (
        edges.join(
            core_lab.select(F.col("pid").alias("qid"), "cluster_id"), "qid"
        )
        .groupBy("pid")
        .agg(F.min("cluster_id").alias("cluster_id"))
        .join(core, "pid", "left_anti")
    )
    return core_lab.unionByName(border.select("pid", "cluster_id"))


def _emb_pts(spark, sf_dir: str, jitter: bool) -> DataFrame:
    from bigdatanycdiseasesurveillance_spark.operators.clustering import (
        seeded_jitter,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = F.col("embedding")[0].cast("double")
    y = F.col("embedding")[1].cast("double")
    if jitter:
        x = x + seeded_jitter(F.col("vec_id"), seed=42)
        y = y + seeded_jitter(F.col("vec_id"), seed=43)
    return emb.select(F.col("vec_id").alias("pid"), x.alias("x"), y.alias("y"))


def _profile(assigned: DataFrame, pts: DataFrame) -> DataFrame:
    return (
        assigned.join(pts, "pid")
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("size"),
            F.round(F.avg("x"), 4).alias("centroid_x"),
            F.round(F.avg("y"), 4).alias("centroid_y"),
        )
    )


def twin_cluster_grid_dbscan(spark, sf_dir: str) -> DataFrame:
    pts = _emb_pts(spark, sf_dir, jitter=False)
    return _profile(dbscan_assign_cc(pts, eps=0.05, min_samples=4), pts)


def twin_cluster_dbscan_jittered(spark, sf_dir: str) -> DataFrame:
    pts = _emb_pts(spark, sf_dir, jitter=True)
    return _profile(dbscan_assign_cc(pts, eps=0.05, min_samples=4), pts)


def twin_cluster_geo_pipeline(spark, sf_dir: str) -> DataFrame:
    from bigdatanycdiseasesurveillance_spark.domain.location import (
        neighborhood_dim,
    )
    from bigdatanycdiseasesurveillance_spark.operators.clustering import (
        seeded_jitter,
    )
    from bigdatanycdiseasesurveillance_spark.queries.geo_pipeline_q import (
        _EPS,
        _MIN_SAMPLES,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "purchase"
    )
    jittered = ev.select(
        F.col("event_id").alias("pid"),
        (
            F.lit(40.60)
            + (F.col("user_id") % 37).cast("double") / 100.0
            + seeded_jitter(F.col("event_id"), seed=7)
        ).alias("x"),
        (
            F.lit(-74.00)
            + (F.col("user_id") % 23).cast("double") / 100.0
            + seeded_jitter(F.col("event_id"), seed=8)
        ).alias("y"),
    )
    nb = neighborhood_dim(spark).select(
        "neighborhood", "lat_min", "lat_max", "lon_min", "lon_max"
    )
    located = (
        jittered.join(
            F.broadcast(nb),
            (jittered.x >= nb.lat_min)
            & (jittered.x <= nb.lat_max)
            & (jittered.y >= nb.lon_min)
            & (jittered.y <= nb.lon_max),
        )
        .groupBy("pid", "x", "y")
        .agg(F.min("neighborhood").alias("neighborhood"))
    ).localCheckpoint(eager=False)
    assigned = dbscan_assign_cc(
        located.select("pid", "x", "y"), eps=_EPS, min_samples=_MIN_SAMPLES
    )
    clustered = assigned.join(located, "pid")
    counts = clustered.groupBy("cluster_id", "neighborhood").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("cnt"), F.asc("neighborhood"))
    top = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("neighborhood").alias("top_neighborhood"))
    )
    stats = clustered.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("size"),
        F.round(F.avg("x"), 4).alias("centroid_lat"),
        F.round(F.avg("y"), 4).alias("centroid_lon"),
    )
    return stats.join(F.broadcast(top), "cluster_id").select(
        "cluster_id", "size", "centroid_lat", "centroid_lon", "top_neighborhood"
    )


def twin_dedup_levenshtein_pairs(spark, sf_dir: str) -> DataFrame:
    """Independent plan for dedup_levenshtein_pairs (r10 verdict
    directive #6: its sf1 audit row has said ORACLE-TIMEOUT since r8 —
    DuckDB's unthresholded levenshtein cannot clear the blocked pair
    set inside the cap, while the engine finishes in ~54s).

    Same semantics — pairs within (source, 20-char length bucket)
    blocks with edit distance <= 5 — recomputed by an ALGORITHMICALLY
    DISTINCT route, so registry-vs-twin equality at sf1 is a dual-plan
    value proof:

    - prune: character-frequency L1 lower bound instead of the
      production length residual. Every single edit changes per-char
      counts by at most 2 L1 units (substitution: one char -1, another
      +1; insert/delete: 1), and dropping characters outside the
      counted alphabet only shrinks the distance, so over ANY char set
      sum|cnt_a - cnt_b| > 2k implies edit distance > k — lossless;
    - kernel: the UNBOUNDED two-arg levenshtein (full O(L^2) DP, no
      early-abandon threshold path) filtered to <= 5 afterwards.
    """
    from bigdatanycdiseasesurveillance_spark.queries.ir_q import _LEV_MAX

    chars = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [" "]
    cf = F.array(
        *[
            (
                F.length("text") - F.length(F.expr(f"replace(text, '{c}', '')"))
            ).cast("long")
            for c in chars
        ]
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "source",
        "text",
        (F.col("n_chars") / 20).cast("long").alias("lb"),
        cf.alias("cf"),
    )
    a = d.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("s_a"),
        F.col("text").alias("t_a"), F.col("lb").alias("lb_a"),
        F.col("cf").alias("cf_a"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("s_b"),
        F.col("text").alias("t_b"), F.col("lb").alias("lb_b"),
        F.col("cf").alias("cf_b"),
    )
    l1 = F.expr(
        "aggregate(zip_with(cf_a, cf_b, (x, y) -> abs(x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )
    return (
        a.join(
            b,
            (F.col("s_a") == F.col("s_b"))
            & (F.col("lb_a") == F.col("lb_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(l1 <= 2 * _LEV_MAX)
        .withColumn("edit_distance", F.levenshtein("t_a", "t_b").cast("long"))
        .filter(F.col("edit_distance") <= _LEV_MAX)
        .select("id_a", "id_b", "edit_distance")
    )


ALT_TWINS = {
    "cluster_grid_dbscan": twin_cluster_grid_dbscan,
    "cluster_dbscan_jittered": twin_cluster_dbscan_jittered,
    "cluster_geo_pipeline": twin_cluster_geo_pipeline,
    "dedup_levenshtein_pairs": twin_dedup_levenshtein_pairs,
}
