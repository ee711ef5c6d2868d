"""The reference's flagship spatial analysis as ONE composed query
(reference: src/analysis/spatial_clustering.py:249-340 end-to-end):
seeded coordinate jitter -> point-in-bbox neighborhood join ->
grid-DBSCAN -> per-cluster profile with the dominant neighborhood.

Every stage is individually green elsewhere (cluster_dbscan_jittered,
loc_fallback_resolution, cluster_grid_dbscan); this entry makes the
composition itself a driver-checkable row with one chained-CTE oracle.

Scale shape: the bbox dim broadcasts (KB-sized — BroadcastNestedLoop on
the non-equi predicate, fact side never shuffles), DBSCAN edges come
from eps-grid equi-joins (never all-pairs), and the profile is a
cluster-key groupBy. The only collect is grid_dbscan's convergence
probe (1-row limit per round).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..domain.location import neighborhood_dim
from ..operators import clustering as C
from ..operators.clustering import jitter_sql
from ..registry import register
from ..tables import table

_EPS = 0.03
_MIN_SAMPLES = 3


def _geo_oracle() -> str:
    nbhd_values = """
            SELECT * FROM (VALUES
                ('Astoria',40.756,40.786,-73.945,-73.905),
                ('Williamsburg',40.697,40.725,-73.972,-73.935),
                ('Bushwick',40.683,40.709,-73.945,-73.895),
                ('Harlem',40.797,40.835,-73.965,-73.920),
                ('East Village',40.721,40.734,-73.995,-73.972),
                ('Riverdale',40.880,40.915,-73.930,-73.890),
                ('Flushing',40.745,40.775,-73.845,-73.800),
                ('St. George',40.635,40.650,-74.090,-74.065))
                t(neighborhood, lat_min, lat_max, lon_min, lon_max)
    """
    return f"""
        WITH RECURSIVE rec AS (
            SELECT event_id AS pid,
                   40.60 + CAST(user_id % 37 AS DOUBLE) / 100.0
                         + ({jitter_sql("event_id", seed=7)}) AS x,
                   -74.00 + CAST(user_id % 23 AS DOUBLE) / 100.0
                          + ({jitter_sql("event_id", seed=8)}) AS y
            FROM events WHERE event_type = 'purchase'
        ), nbhd AS ({nbhd_values}
        ), pts AS (
            SELECT r.pid, r.x, r.y, MIN(n.neighborhood) AS neighborhood
            FROM rec r JOIN nbhd n
              ON r.x >= n.lat_min AND r.x <= n.lat_max
             AND r.y >= n.lon_min AND r.y <= n.lon_max
            GROUP BY 1, 2, 3
        ), edges AS (
            SELECT a.pid, b.pid AS qid
            FROM pts a JOIN pts b
              ON POWER(a.x - b.x, 2) + POWER(a.y - b.y, 2)
                 <= {_EPS} * {_EPS}
        ), core AS (
            SELECT pid FROM edges GROUP BY pid
            HAVING COUNT(*) >= {_MIN_SAMPLES}
        ), core_edges AS (
            SELECT e.pid, e.qid FROM edges e
            JOIN core c1 ON e.pid = c1.pid
            JOIN core c2 ON e.qid = c2.pid
            WHERE e.pid <> e.qid
        ), walk(node, comp) AS (
            SELECT pid, pid FROM core
            UNION
            SELECT ce.qid, w.comp
            FROM walk w JOIN core_edges ce ON ce.pid = w.node
            WHERE w.comp < ce.qid
        ), core_label AS (
            SELECT node AS pid, MIN(comp) AS cluster_id FROM walk GROUP BY node
        ), border AS (
            SELECT e.pid, MIN(cl.cluster_id) AS cluster_id
            FROM edges e JOIN core_label cl ON e.qid = cl.pid
            WHERE e.pid NOT IN (SELECT pid FROM core)
            GROUP BY e.pid
        ), assigned AS (
            SELECT pid, cluster_id FROM core_label
            UNION ALL SELECT pid, cluster_id FROM border
        ), prof AS (
            SELECT a.cluster_id, p.neighborhood, COUNT(*) AS cnt
            FROM assigned a JOIN pts p ON a.pid = p.pid
            GROUP BY 1, 2
        ), topn AS (
            SELECT cluster_id, neighborhood,
                   ROW_NUMBER() OVER (
                       PARTITION BY cluster_id
                       ORDER BY cnt DESC, neighborhood
                   ) AS rn
            FROM prof
        )
        SELECT a.cluster_id,
               CAST(COUNT(*) AS BIGINT) AS size,
               ROUND(AVG(p.x), 4) AS centroid_lat,
               ROUND(AVG(p.y), 4) AS centroid_lon,
               MIN(t.neighborhood) AS top_neighborhood
        FROM assigned a
        JOIN pts p ON a.pid = p.pid
        JOIN topn t ON t.cluster_id = a.cluster_id AND t.rn = 1
        GROUP BY a.cluster_id
    """


@register(
    "cluster_geo_pipeline",
    oracle=_geo_oracle(),
    tags=("cluster", "geo", "M7", "M9", "J3", "composed"),
)
def cluster_geo_pipeline(spark, sf_dir):
    """Jitter -> bbox-join -> DBSCAN -> profile, composed. Purchase
    events carry synthetic NYC coordinates (user_id lattice + exact
    integer-LCG jitter, both engines replay bit-for-bit); points inside
    a neighborhood bbox cluster with grid-DBSCAN; each cluster reports
    size, centroid, and its dominant neighborhood (deterministic mode:
    max count, ties alphabetical)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    jittered = ev.select(
        "event_id",
        (
            F.lit(40.60)
            + (F.col("user_id") % 37).cast("double") / 100.0
            + C.seeded_jitter(F.col("event_id"), seed=7)
        ).alias("x"),
        (
            F.lit(-74.00)
            + (F.col("user_id") % 23).cast("double") / 100.0
            + C.seeded_jitter(F.col("event_id"), seed=8)
        ).alias("y"),
    )
    nb = neighborhood_dim(spark).select(
        "neighborhood", "lat_min", "lat_max", "lon_min", "lon_max"
    )
    # a point on the exact shared edge of two bboxes matches both —
    # MIN(neighborhood) keeps membership single-valued on both engines
    located = (
        jittered.join(
            F.broadcast(nb),
            (jittered.x >= nb.lat_min)
            & (jittered.x <= nb.lat_max)
            & (jittered.y >= nb.lon_min)
            & (jittered.y <= nb.lon_max),
        )
        .groupBy("event_id", "x", "y")
        .agg(F.min("neighborhood").alias("neighborhood"))
    )
    assigned = C.grid_dbscan(
        located, eps=_EPS, min_samples=_MIN_SAMPLES, id_col="event_id"
    ).filter(F.col("cluster_id") >= 0)
    clustered = assigned.join(located, "event_id")
    counts = clustered.groupBy("cluster_id", "neighborhood").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("cnt"), F.asc("neighborhood")
    )
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


def _geohash_oracle() -> str:
    from ..functions.geohash import geohash_stages

    cx, cy, value, chars = geohash_stages("lat", "lon", precision=6)
    return f"""
        WITH pts AS (
            SELECT user_id,
                   40.60 + CAST(user_id % 37 AS DOUBLE) / 100.0 AS lat,
                   -74.00 + CAST(user_id % 23 AS DOUBLE) / 100.0 AS lon
            FROM events WHERE event_type = 'purchase'
        ), s1 AS (
            SELECT user_id, {cx} AS gh_cx, {cy} AS gh_cy FROM pts
        ), s2 AS (
            SELECT user_id, {value} AS gh_v FROM s1
        ), g AS (
            SELECT user_id, {chars} AS geohash FROM s2
        )
        SELECT geohash,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM g GROUP BY geohash
        ORDER BY n_events DESC, geohash LIMIT 20
    """


@register(
    "geo_geohash_rollup",
    oracle=_geohash_oracle(),
    tags=("geo", "geohash", "blocking"),
)
def geo_geohash_rollup(spark, sf_dir):
    """Geohash-6 hot-cell rollup over the purchase lattice: the encode
    is generated closed-form integer SQL (functions/geohash.py — bit
    interleave + base32, validated against the canonical u4pruydqqvj
    test vector), chained as three projections so each stage computes
    once and stays in whole-stage codegen. Geohash prefixes are the
    public-format spatial blocking key: a prefix equi-join replaces a
    quadratic distance join, exactly the eps-grid trick grid_dbscan
    uses, but exchangeable with external systems. One groupBy shuffle
    on the cell key; TakeOrdered top-20."""
    from ..functions.geohash import geohash_stages

    cx, cy, value, chars = geohash_stages("lat", "lon", precision=6)
    pts = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .selectExpr(
            "user_id",
            "40.60D + CAST(user_id % 37 AS DOUBLE) / 100.0D AS lat",
            "-74.00D + CAST(user_id % 23 AS DOUBLE) / 100.0D AS lon",
        )
    )
    g = (
        pts.withColumn("gh_cx", F.expr(cx))
        .withColumn("gh_cy", F.expr(cy))
        .withColumn("gh_v", F.expr(value))
        .withColumn("geohash", F.expr(chars))
    )
    return (
        g.groupBy("geohash")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.desc("n_events"), F.asc("geohash"))
        .limit(20)
    )


_CG_EPS = 0.05
_CG_KEY = 100000  # cell key = cx * _CG_KEY + cy (|cy| << _CG_KEY)
# core cell <=> weighted 8-neighborhood density >= 1.2x the mean
# (10*dens*C >= 12*9*N in exact integers). A relative threshold keeps
# the contract meaningful at ANY corpus density — an absolute min_pts
# saturates to one giant cluster as data grows on fixed geography.


def _cellgrid_oracle() -> str:
    jx, jy = jitter_sql("event_id", seed=7), jitter_sql("event_id", seed=8)
    return f"""
        WITH RECURSIVE rec AS (
            SELECT event_id,
                   40.60 + CAST(user_id % 37 AS DOUBLE) / 100.0 + ({jx}) AS x,
                   -74.00 + CAST(user_id % 23 AS DOUBLE) / 100.0 + ({jy}) AS y
            FROM events WHERE event_type = 'purchase'
        ), cells AS (
            SELECT CAST(FLOOR(x / {_CG_EPS}) AS BIGINT) AS cx,
                   CAST(FLOOR(y / {_CG_EPS}) AS BIGINT) AS cy,
                   CAST(COUNT(*) AS BIGINT) AS w
            FROM rec GROUP BY 1, 2
        ), dens AS (
            SELECT a.cx, a.cy, SUM(b.w) AS dens, COUNT(*) AS cnt
            FROM cells a JOIN cells b
              ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
            GROUP BY 1, 2
        ), tot AS (
            SELECT CAST(SUM(w) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS c
            FROM cells
        ), core AS (
            SELECT c.cx, c.cy, c.w, c.cx * {_CG_KEY} + c.cy AS k
            FROM cells c JOIN dens d ON d.cx = c.cx AND d.cy = c.cy
            WHERE 10 * d.dens * (SELECT c FROM tot)
                  >= 12 * d.cnt * (SELECT n FROM tot)
        ), cedges AS (
            SELECT a.k, b.k AS qk FROM core a JOIN core b
              ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
        ), walk(node, comp) AS (
            SELECT k, k FROM core
            UNION
            SELECT ce.qk, w.comp FROM walk w JOIN cedges ce ON ce.k = w.node
            WHERE w.comp < ce.qk
        ), clabel AS (
            SELECT node AS k, MIN(comp) AS cid FROM walk GROUP BY node
        ), border AS (
            SELECT c.cx, c.cy, c.w, MIN(cl.cid) AS cid
            FROM cells c
            JOIN core co ON abs(c.cx - co.cx) <= 1 AND abs(c.cy - co.cy) <= 1
            JOIN clabel cl ON cl.k = co.k
            WHERE c.cx * {_CG_KEY} + c.cy NOT IN (SELECT k FROM core)
            GROUP BY 1, 2, 3
        ), assigned AS (
            SELECT co.cx, co.cy, co.w, cl.cid
            FROM core co JOIN clabel cl ON cl.k = co.k
            UNION ALL SELECT cx, cy, w, cid FROM border
            UNION ALL
            SELECT c.cx, c.cy, c.w, -1 AS cid
            FROM cells c
            WHERE c.cx * {_CG_KEY} + c.cy NOT IN (
                SELECT co.cx * {_CG_KEY} + co.cy FROM core co
                UNION ALL SELECT b.cx * {_CG_KEY} + b.cy FROM border b)
        )
        SELECT cid AS cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(w) AS BIGINT) AS n_points,
               CAST(MIN(cx) AS BIGINT) AS min_cx,
               CAST(MAX(cx) AS BIGINT) AS max_cx,
               CAST(MIN(cy) AS BIGINT) AS min_cy,
               CAST(MAX(cy) AS BIGINT) AS max_cy
        FROM assigned GROUP BY cid
    """


@register(
    "cluster_geo_cellgrid",
    oracle=_cellgrid_oracle(),
    tags=("cluster", "geo", "M7", "scale-path", "composed"),
)
def cluster_geo_cellgrid(spark, sf_dir):
    """The PRODUCTION scale path for geographic density clustering —
    the mitigation SCALE.md names for cluster_geo_pipeline's sf1 slow
    tail (651.8s: the exact eps-graph densifies quadratically at fixed
    geography). Points pre-aggregate into eps-grid micro-cells (count
    per cell), density = weighted 8-neighborhood sum, core cells
    cluster by grid adjacency, border cells attach to the min-labeled
    core neighbor. Every join and CC iteration is keyed by CELL, and
    the cell count is bounded by geography/eps^2 — corpus-size
    INDEPENDENT, so the plan is identical at 100x the points while the
    exact variant's edge list grows with density squared. The exact
    DBSCAN stays as the verification surface; this is what a recurring
    100 TB job runs. Contract is integer-pure (cell keys, counts,
    bounding boxes) — no float summation order anywhere."""
    from ..operators.dedup import connected_components

    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    pts = ev.select(
        (
            F.lit(40.60)
            + (F.col("user_id") % 37).cast("double") / 100.0
            + C.seeded_jitter(F.col("event_id"), seed=7)
        ).alias("x"),
        (
            F.lit(-74.00)
            + (F.col("user_id") % 23).cast("double") / 100.0
            + C.seeded_jitter(F.col("event_id"), seed=8)
        ).alias("y"),
    )
    cells = (
        pts.select(
            F.floor(F.col("x") / _CG_EPS).cast("long").alias("cx"),
            F.floor(F.col("y") / _CG_EPS).cast("long").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count("*").cast("long").alias("w"))
        .localCheckpoint(eager=False)  # cell-sized; consumed by 4 joins below
    )
    a, b = cells.alias("a"), cells.alias("b")
    cheb = (
        (F.abs(F.col("a.cx") - F.col("b.cx")) <= 1)
        & (F.abs(F.col("a.cy") - F.col("b.cy")) <= 1)
    )
    dens = (
        a.join(F.broadcast(b), cheb)
        .groupBy(F.col("a.cx").alias("cx"), F.col("a.cy").alias("cy"))
        .agg(F.sum("b.w").alias("dens"), F.count("*").alias("cnt"))
    )
    tot = cells.agg(
        F.sum("w").cast("long").alias("n"), F.count("*").cast("long").alias("c")
    )
    key = (F.col("cx") * _CG_KEY + F.col("cy")).alias("k")
    core = (
        cells.join(
            dens.crossJoin(F.broadcast(tot)).filter(
                10 * F.col("dens") * F.col("c") >= 12 * F.col("cnt") * F.col("n")
            ),
            ["cx", "cy"],
        )
        .select("cx", "cy", "w", key)
        .localCheckpoint(eager=False)
    )
    ca, cb = core.alias("ca"), core.alias("cb")
    cedges = ca.join(
        F.broadcast(cb),
        (F.abs(F.col("ca.cx") - F.col("cb.cx")) <= 1)
        & (F.abs(F.col("ca.cy") - F.col("cb.cy")) <= 1),
    ).select(F.col("ca.k").alias("id_a"), F.col("cb.k").alias("id_b"))
    clabel = connected_components(cedges).withColumnRenamed(
        "doc_id", "k"
    ).withColumnRenamed("canonical_id", "cid")
    core_lab = core.join(clabel, "k").select("cx", "cy", "w", "cid")
    border = (
        cells.join(F.broadcast(core_lab.select(
            F.col("cx").alias("ox"), F.col("cy").alias("oy"), "cid"
        )),
            (F.abs(F.col("cx") - F.col("ox")) <= 1)
            & (F.abs(F.col("cy") - F.col("oy")) <= 1),
        )
        .join(core.select("cx", "cy", F.lit(True).alias("is_core")), ["cx", "cy"], "left_anti")
        .groupBy("cx", "cy", "w")
        .agg(F.min("cid").alias("cid"))
    )
    assigned = core_lab.unionByName(border.select("cx", "cy", "w", "cid"))
    noise = (
        cells.join(assigned.select("cx", "cy"), ["cx", "cy"], "left_anti")
        .select("cx", "cy", "w", F.lit(-1).cast("long").alias("cid"))
    )
    assigned = assigned.unionByName(noise)
    return assigned.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum("w").cast("long").alias("n_points"),
        F.min("cx").cast("long").alias("min_cx"),
        F.max("cx").cast("long").alias("max_cx"),
        F.min("cy").cast("long").alias("min_cy"),
        F.max("cy").cast("long").alias("max_cy"),
    )
