"""Graph analytics over a derived co-occurrence graph: triangle
counting with degree-ordered orientation — the companion to the
connected-components labeling in operators/dedup.py (duplicate groups
ARE a graph op; this adds the local-structure metric a curation
pipeline uses to characterize near-dup cluster density).

Scale notes: the classic hazard is the wedge join exploding on hub
vertices (sum of degree^2). Orienting every edge from its
lower-(degree, id) endpoint to the higher one bounds each vertex's
out-degree by O(sqrt(|E|)) — the standard compact-forward guarantee —
so the oriented wedge join is linear-ish in |E|^1.5 worst case instead
of sum-of-squares, and every triangle is counted exactly once (unique
lowest endpoint in the orientation order). The oracle runs the naive
id-oriented 3-way self-join: orientation choice never changes the
count, which is precisely what makes the scale trick safely testable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..tables import table


@register(
    "graph_triangle_count",
    oracle="""
        WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lp a JOIN lp b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        deg AS (
            SELECT x, COUNT(*) AS d FROM (
                SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e
            ) GROUP BY x
        ),
        tri AS (
            SELECT COUNT(*) AS t
            FROM e e1
            JOIN e e2 ON e1.v = e2.u
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        w AS (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS wedges FROM deg),
        v AS (SELECT COUNT(*) AS nv FROM deg),
        ne AS (SELECT COUNT(*) AS n_e FROM e)
        SELECT CAST(nv AS BIGINT) AS n_vertices,
               CAST(n_e AS BIGINT) AS n_edges,
               wedges AS n_wedges,
               CAST(t AS BIGINT) AS n_triangles,
               (3.0 * t) / wedges AS global_clustering
        FROM v, ne, w, tri
    """,
    tags=("graph", "triangle", "join"),
)
def graph_triangle_count(spark, sf_dir):
    """Triangles in the part co-purchase graph (parts sharing an
    order). Engine plan: distinct edges -> degree table (vertex-count
    rows, broadcast) -> orient each edge low-(degree,id) to high ->
    wedge equi-join on the middle vertex -> left-semi close against
    the oriented edge set. Global clustering coefficient emitted as
    the raw (3T)/wedges division — exact integers into IEEE division,
    bit-identical across engines. The oracle's naive 3-way self-join
    proves orientation-invariance of the count."""
    lp = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = lp.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = lp.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    e = a.join(b, "k").filter(F.col("u") < F.col("v")).select("u", "v").distinct()

    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    ranked = e.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )

    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    closing = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = wedges.join(closing, ["a", "c"], "left_semi").agg(
        F.count("*").alias("t")
    )

    stats = deg.agg(
        F.count("*").cast("long").alias("n_vertices"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
    )
    n_edges = e.agg(F.count("*").cast("long").alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_vertices",
            "n_edges",
            "n_wedges",
            F.col("t").cast("long").alias("n_triangles"),
            ((F.lit(3.0) * F.col("t")) / F.col("n_wedges")).alias(
                "global_clustering"
            ),
        )
    )
