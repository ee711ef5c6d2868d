"""Location enrichment as broadcast dimension joins (SURVEY §2.3
J2-J7).

The reference resolves location per record with in-process dict scans
(reference: src/spark_consumers/nyc_neighborhoods.py:176-241) under a
fallback priority subreddit > coordinates > zip > text-alias
(reference: src/spark_consumers/location_consumer.py:329-372). Engine
form: each lookup is a broadcast left join producing candidate columns;
the priority is one `coalesce` per output field. The fact side never
shuffles — every dim is KB-sized.

Dimension data here is a compact representative NYC subset (own
construction, not a copy of the reference's tables); swapping in a full
gazetteer is a data change, not a code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import values_dim

# (borough, zip_prefix) — J2's zip-prefix lookup
BOROUGH_ZIP_PREFIXES = [
    ("Manhattan", "100"),
    ("Manhattan", "101"),
    ("Manhattan", "102"),
    ("Bronx", "104"),
    ("Staten Island", "103"),
    ("Queens", "110"),
    ("Queens", "111"),
    ("Queens", "113"),
    ("Queens", "114"),
    ("Queens", "116"),
    ("Brooklyn", "112"),
]

# (neighborhood, borough, lat_min, lat_max, lon_min, lon_max, zips)
NEIGHBORHOODS = [
    ("Astoria", "Queens", 40.756, 40.786, -73.945, -73.905, ["11102", "11103", "11105", "11106"]),
    ("Williamsburg", "Brooklyn", 40.697, 40.725, -73.972, -73.935, ["11211", "11249"]),
    ("Bushwick", "Brooklyn", 40.683, 40.709, -73.945, -73.895, ["11206", "11207", "11221", "11237"]),
    ("Harlem", "Manhattan", 40.797, 40.835, -73.965, -73.920, ["10026", "10027", "10030", "10037", "10039"]),
    ("East Village", "Manhattan", 40.721, 40.734, -73.995, -73.972, ["10003", "10009"]),
    ("Riverdale", "Bronx", 40.880, 40.915, -73.930, -73.890, ["10463", "10471"]),
    ("Flushing", "Queens", 40.745, 40.775, -73.845, -73.800, ["11354", "11355", "11358"]),
    ("St. George", "Staten Island", 40.635, 40.650, -74.090, -74.065, ["10301"]),
]

# (alias, canonical_neighborhood) — J6's alias normalization
ALIASES = [
    ("astoria queens", "Astoria"),
    ("wburg", "Williamsburg"),
    ("the burg", "Williamsburg"),
    ("east vil", "East Village"),
    ("ev", "East Village"),
    ("harlem ny", "Harlem"),
]

# (subreddit, neighborhood) — J5's subreddit map (borough derives via J7)
SUBREDDITS = [
    ("astoria", "Astoria"),
    ("williamsburg", "Williamsburg"),
    ("bushwick", "Bushwick"),
    ("harlem", "Harlem"),
    ("eastvillage", "East Village"),
    ("flushing", "Flushing"),
]


def borough_zip_dim(spark: SparkSession) -> DataFrame:
    # values_dim -> LocalTableScan: broadcasting this dim costs no job
    return values_dim(spark, BOROUGH_ZIP_PREFIXES, "borough string, zip_prefix string")


def neighborhood_dim(spark: SparkSession) -> DataFrame:
    return values_dim(
        spark,
        NEIGHBORHOODS,
        "neighborhood string, borough string, lat_min double, lat_max double,"
        " lon_min double, lon_max double, zips array<string>",
    )


def neighborhood_zip_dim(spark: SparkSession) -> DataFrame:
    """J4: exploded (neighborhood, zip) lookup."""
    return neighborhood_dim(spark).select(
        "neighborhood", "borough", F.explode("zips").alias("zip")
    )


# J7 (neighborhood -> borough) resolved at module load: the dim data is
# static Python constants, so the dim-to-dim join is a dict lookup here
# rather than an extra broadcast-join stage Janino has to compile into
# every query that touches location enrichment.
_NB_BOROUGH = {n[0]: n[1] for n in NEIGHBORHOODS}


def alias_dim(spark: SparkSession) -> DataFrame:
    """J6 + J7 at build time: alias -> canonical neighborhood -> borough
    (a dim-to-dim join performed once at module load, not per record)."""
    rows = [(a, n, _NB_BOROUGH[n]) for a, n in ALIASES]
    return values_dim(
        spark, rows, "alias string, neighborhood string, alias_borough string"
    )


def subreddit_dim(spark: SparkSession) -> DataFrame:
    """J5 + J7: subreddit -> neighborhood -> borough."""
    rows = [(s, n, _NB_BOROUGH[n]) for s, n in SUBREDDITS]
    return values_dim(
        spark, rows, "subreddit string, neighborhood string, sub_borough string"
    )


def enrich_with_location(
    records: DataFrame,
    spark: SparkSession,
    subreddit_col: str = "subreddit",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    zip_col: str = "zip",
    text_col: str = "text",
) -> DataFrame:
    """The full fallback cascade (location_consumer.py:329-372), as four
    broadcast left joins + coalesce:

    1. subreddit map (J5) — strongest signal;
    2. point-in-bbox (J3) — broadcast range join on lat/lon;
    3. zip -> neighborhood (J4), zip prefix -> borough (J2);
    4. text alias scan (J6) — first alias contained in lowercased text.

    Adds: neighborhood, borough, location_source. Sources that lack one
    of the signal columns (e.g. reddit posts have no zip) contribute a
    null signal for it — same as the reference's absent-field handling.

    Construction note: the cascade is assembled as ONE spark.sql
    statement over a temp view of `records` (dims inline as VALUES →
    LocalRelation, so broadcasting them costs no job). PySpark Datasets
    analyze eagerly per transformation, so the previous ~15-op
    DataFrame chain paid ~15 rounds of growing-plan analysis (~0.7 s
    of driver time) before a single row moved; one statement is one
    analysis. The physical plan is unchanged (all-broadcast, zero
    fact-side exchange — pinned in tests/test_plans.py).
    """
    cols = records.columns

    def _sig(name: str, typ: str = "STRING") -> str:
        return f"r.`{name}`" if name in cols else f"CAST(NULL AS {typ})"

    sub_c, zip_c, text_c = _sig(subreddit_col), _sig(zip_col), _sig(text_col)
    lat_c, lon_c = _sig(lat_col, "DOUBLE"), _sig(lon_col, "DOUBLE")

    def _slit(v: str) -> str:
        # Same escaping as tables.values_dim: Spark's parser interprets
        # backslash escapes inside string literals, and a dim value with
        # an apostrophe ("hell's kitchen") must not break the SQL.
        return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"

    def _values(rows, names) -> str:
        def lit(v):
            return _slit(v) if isinstance(v, str) else repr(float(v)) + "D"

        body = ", ".join(
            "(" + ", ".join(lit(v) for v in r) + ")" for r in rows
        )
        return f"VALUES {body} AS t({', '.join(names)})"

    def _alias_case(pick) -> str:
        whens = " ".join(
            f"WHEN instr(__text_lc, {_slit(a)}) > 0 THEN {_slit(pick(a, n))}"
            for a, n in ALIASES
        )
        return f"CASE {whens} ELSE NULL END"

    sub_rows = [(s, n, _NB_BOROUGH[n]) for s, n in SUBREDDITS]
    bbox_rows = [(n[0], n[1], n[2], n[3], n[4], n[5]) for n in NEIGHBORHOODS]
    nz_rows = [(z, n[0], n[1]) for n in NEIGHBORHOODS for z in n[6]]
    bz_rows = [(p, b) for b, p in BOROUGH_ZIP_PREFIXES]

    # uuid-suffixed view: a fixed name lets concurrent/nested enrichments
    # in one session clobber each other's input between create and
    # spark.sql, and leaks into session state. Analysis is eager, so the
    # view can be dropped as soon as spark.sql returns the DataFrame.
    import uuid

    view = f"__loc_enrich_records_{uuid.uuid4().hex}"
    records.createOrReplaceTempView(view)
    out_cols = ", ".join(f"r.`{c}`" for c in cols)
    # the alias when-chain is computed ONCE in the `r` subquery:
    # inlining it into the three output expressions tripled the
    # generated-code size and was the dominant Janino-compile cost
    out = spark.sql(f"""
        SELECT /*+ BROADCAST(s), BROADCAST(n), BROADCAST(z), BROADCAST(p) */
               {out_cols},
               COALESCE(s.sub_nbhd, n.geo_nbhd, z.zip_nbhd, r.__alias_nbhd)
                   AS neighborhood,
               COALESCE(s.sub_borough, n.geo_borough, z.zip_borough,
                        p.pfx_borough, r.__alias_borough) AS borough,
               CASE WHEN s.sub_nbhd IS NOT NULL THEN 'subreddit'
                    WHEN n.geo_nbhd IS NOT NULL THEN 'coordinates'
                    WHEN z.zip_nbhd IS NOT NULL
                         OR p.pfx_borough IS NOT NULL THEN 'zip'
                    WHEN r.__alias_nbhd IS NOT NULL THEN 'text_extraction'
                    END AS location_source
        FROM (
            SELECT r.*,
                   {_alias_case(lambda a, n: n)} AS __alias_nbhd,
                   {_alias_case(lambda a, n: _NB_BOROUGH[n])} AS __alias_borough
            FROM (SELECT r.*, lower({text_c}) AS __text_lc FROM {view} r) r
        ) r
        LEFT JOIN ({_values(sub_rows, ["subreddit", "sub_nbhd", "sub_borough"])}) s
               ON lower({sub_c}) = s.subreddit
        LEFT JOIN ({_values(bbox_rows, ["geo_nbhd", "geo_borough", "lat_min", "lat_max", "lon_min", "lon_max"])}) n
               ON {lat_c} >= n.lat_min AND {lat_c} <= n.lat_max
              AND {lon_c} >= n.lon_min AND {lon_c} <= n.lon_max
        LEFT JOIN ({_values(nz_rows, ["zip", "zip_nbhd", "zip_borough"])}) z
               ON {zip_c} = z.zip
        LEFT JOIN ({_values(bz_rows, ["zip_prefix", "pfx_borough"])}) p
               ON substring({zip_c}, 1, 3) = p.zip_prefix
    """)
    spark.catalog.dropTempView(view)
    return out
