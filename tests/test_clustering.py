"""Clustering semantics on a fixture with known ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatanycdiseasesurveillance_spark.operators import clustering as C
from bigdatanycdiseasesurveillance_spark.tables import table


def _fixture(spark):
    """Two dense blobs + isolated noise points, eps=1.0, min_samples=3."""
    rows = []
    # blob A around (0,0): 5 points within eps of each other
    for i, (x, y) in enumerate([(0, 0), (0.3, 0), (0, 0.3), (0.3, 0.3), (0.15, 0.15)]):
        rows.append((i, float(x), float(y)))
    # blob B around (10,10)
    for i, (x, y) in enumerate([(10, 10), (10.4, 10), (10, 10.4), (10.4, 10.4)]):
        rows.append((100 + i, float(x), float(y)))
    # noise
    rows += [(200, 50.0, 50.0), (201, -50.0, 50.0)]
    return spark.createDataFrame(rows, "vec_id long, x double, y double")


def test_dbscan_finds_known_clusters(spark):
    out = {
        r["vec_id"]: r["cluster_id"]
        for r in C.grid_dbscan(_fixture(spark), eps=1.0, min_samples=3).collect()
    }
    blob_a = {out[i] for i in range(5)}
    blob_b = {out[100 + i] for i in range(4)}
    assert len(blob_a) == 1 and len(blob_b) == 1
    assert blob_a != blob_b
    assert out[200] == -1 and out[201] == -1


def test_dbscan_cross_cell_merge(spark):
    """A chain crossing grid-cell boundaries must collapse to ONE
    cluster (exercises the iterative min-label merge)."""
    pts = spark.createDataFrame(
        [(i, i * 0.9, 0.0) for i in range(10)], "vec_id long, x double, y double"
    )
    out = C.grid_dbscan(pts, eps=1.0, min_samples=2)
    ids = {r["cluster_id"] for r in out.collect()}
    assert ids == {0}


def test_kmeans_partitions_everything(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    assigned = C.kmeans_clusters(emb, k=5, seed=42)
    assert assigned.count() == emb.count()
    assert assigned.select("cluster_id").distinct().count() <= 5
    assert assigned.filter(F.col("cluster_id").isNull()).count() == 0


def test_cellgrid_conserves_points_and_partitions_cells(spark, sf_dir):
    """The cell-grid scale path must account for every point exactly
    once: cluster n_points + noise n_points == total purchase events,
    and the cell bounding boxes stay inside the jittered lattice."""
    from pyspark.sql import functions as F

    from bigdatanycdiseasesurveillance_spark.registry import all_specs

    out = all_specs()["cluster_geo_cellgrid"].fn(spark, sf_dir).collect()
    total = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r["n_points"] for r in out) == total
    assert any(r["cluster_id"] >= 0 for r in out)  # at least one cluster
    for r in out:
        assert r["n_cells"] >= 1
        assert r["min_cx"] <= r["max_cx"] and r["min_cy"] <= r["max_cy"]
