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


def test_cellgrid_key_pack_accepts_negative_cy_and_guards_span(spark):
    """The packed cell key is injective iff the occupied cy SPAN stays
    under key_mult (negative cy is legal — geo callers floor longitudes
    below zero). In-span negative cells must cluster normally; a span
    >= key_mult must raise, never silently merge distinct cells."""
    import pytest

    ok = spark.createDataFrame(
        # a dense negative-cy blob + one far sparse cell to keep the
        # corpus-mean density below the blob's relative-density bar
        [(0, -7400, 100), (0, -7399, 10), (1, -7400, 10), (500, -7000, 1)],
        "cx long, cy long, w long",
    )
    got = {(r["cx"], r["cy"]): r["cid"] for r in C.cellgrid_assign(ok, key_mult=100000).collect()}
    assert len(got) == 4
    blob = {got[(0, -7400)], got[(0, -7399)], got[(1, -7400)]}
    assert len(blob) == 1 and blob != {-1}  # one cluster over the blob
    assert got[(500, -7000)] == -1  # far sparse cell is noise

    # (0, 0) and (-1, 100000) pack to the SAME key (0*M+0 == -1*M+M);
    # two dense blobs + a sparse far cell so core cells exist and the
    # key expression actually evaluates
    bad = spark.createDataFrame(
        [
            (0, 0, 100),
            (0, 1, 100),
            (-1, 100000, 100),
            (-1, 100001, 100),
            (50, 500, 1),
        ],
        "cx long, cy long, w long",
    )
    with pytest.raises(Exception, match="cy span|would collide"):
        C.cellgrid_assign(bad, key_mult=100000).collect()
