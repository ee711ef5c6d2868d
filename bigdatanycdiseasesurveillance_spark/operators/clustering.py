"""Spatial / embedding clustering operators (SURVEY §2.11 M7-M9, M14).

The reference runs sklearn DBSCAN / KMeans on a driver-side pandas frame
(reference: src/analysis/spatial_clustering.py:299-378). Engine design:

- KMeans      -> Spark ML (native, distributed, seeded)          (M8)
- DBSCAN      -> grid-cell partitioning + per-cell local scan +
                 cross-cell merge via iterative min-label
                 propagation (no GraphFrames dependency)         (M7)
- coherence   -> per-cluster mean pairwise cosine (M14) over the
                 knn/pair machinery in operators.similarity

Grid-DBSCAN scale story: cells are eps-sized, so every true neighbor
pair lives in the same or an adjacent cell. Edge discovery is an
equi-join on cell ids (9 offsets exploded), local density counting is a
groupBy, and the cluster merge is O(diameter) rounds of a broadcast-size
label table — no step ever materializes O(n^2) pairs globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_clusters(
    emb: DataFrame,
    k: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """M8: Spark ML KMeans over the embedding column (seeded, like the
    reference's KMeans(random_state=42) at spatial_clustering.py:367).
    Returns (vec_id, cluster_id)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(
        F.col(id_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(feats)
    return model.transform(feats).select(
        F.col(id_col), F.col("prediction").cast("long").alias("cluster_id")
    )


def grid_dbscan(
    points: DataFrame,
    eps: float,
    min_samples: int = 5,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "vec_id",
    max_rounds: int = 20,
) -> DataFrame:
    """M7: density clustering with DBSCAN semantics on 2-D points.

    1. cell id = (floor(x/eps), floor(y/eps)) — every eps-neighbor pair
       shares a cell or touches an adjacent one;
    2. epsilon-edges: explode 9 neighbor-cell offsets, equi-join on the
       target cell, exact distance filter;
    3. core points: neighbor count (incl. self) >= min_samples;
    4. clusters: connected components over core-core edges via
       iterative min-label propagation (each round: label <- min label
       among core neighbors; converges in graph-diameter rounds);
    5. border points attach to the min cluster among core neighbors;
       everything else is noise (cluster_id = -1).

    Returns (id, cluster_id, is_core). Deterministic: labels are min
    point-ids, ties in border attachment break on min cluster id.
    """
    pts = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
        F.floor(F.col(x_col) / eps).cast("long").alias("cx"),
        F.floor(F.col(y_col) / eps).cast("long").alias("cy"),
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    probes = pts.select(
        "pid",
        "x",
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("tx"), (F.col("cy") + dy).alias("ty")
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("o"),
    ).select("pid", "x", "y", F.col("o.tx").alias("cx"), F.col("o.ty").alias("cy"))
    targets = pts.select(
        F.col("pid").alias("qid"), F.col("x").alias("qx"), F.col("y").alias("qy"), "cx", "cy"
    )
    dist2 = (F.col("x") - F.col("qx")) ** 2 + (F.col("y") - F.col("qy")) ** 2
    edges = (
        probes.join(targets, ["cx", "cy"])
        .filter(dist2 <= F.lit(eps * eps))
        .select("pid", "qid")
        .distinct()  # a pair can meet in several neighbor cells
    )
    degree = edges.groupBy("pid").agg(F.count("*").alias("n_neighbors"))
    core = degree.filter(F.col("n_neighbors") >= min_samples).select("pid")
    core_edges = (
        edges.join(core, "pid")
        .join(core.select(F.col("pid").alias("qid")), "qid")
        .filter(F.col("pid") != F.col("qid"))
    )
    # distinct column names per stage (lid/label) — self-join lineage
    # with shared attribute ids trips Spark's ambiguity check otherwise
    labels = core.select(F.col("pid").alias("lid"), F.col("pid").alias("label"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        neighbor_min = (
            core_edges.join(labels, core_edges.qid == F.col("lid"))
            .groupBy("pid")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, F.col("lid") == neighbor_min.pid, "left")
            .select(
                "lid",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
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
            break
    core_labeled = labels.select(F.col("lid"), F.col("label").alias("cluster_id"))
    border = (
        edges.join(core_labeled, edges.qid == F.col("lid"))
        .groupBy("pid")
        .agg(F.min("cluster_id").alias("cluster_id"))
        .join(core.select(F.col("pid").alias("cpid")), F.col("pid") == F.col("cpid"), "left_anti")
    )
    assigned = core_labeled.select(
        F.col("lid").alias("pid"), "cluster_id", F.lit(True).alias("is_core")
    ).unionByName(border.select("pid", "cluster_id", F.lit(False).alias("is_core")))
    return (
        pts.select("pid")
        .join(assigned, "pid", "left")
        .select(
            F.col("pid").alias(id_col),
            F.coalesce(F.col("cluster_id"), F.lit(-1)).alias("cluster_id"),
            F.coalesce(F.col("is_core"), F.lit(False)).alias("is_core"),
        )
    )


def cluster_profiles(assigned: DataFrame, points: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """A8/M14 rollup: per-cluster size + centroid (the reference's
    pandas value_counts profile, natively)."""
    joined = assigned.filter(F.col("cluster_id") >= 0).join(points, id_col)
    return joined.groupBy("cluster_id").agg(
        F.count("*").alias("size"),
        F.round(F.avg("x"), 4).alias("centroid_x"),
        F.round(F.avg("y"), 4).alias("centroid_y"),
    )
