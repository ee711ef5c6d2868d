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
    return spark.createDataFrame(BOROUGH_ZIP_PREFIXES, "borough string, zip_prefix string")


def neighborhood_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
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
    return spark.createDataFrame(
        rows, "alias string, neighborhood string, alias_borough string"
    )


def subreddit_dim(spark: SparkSession) -> DataFrame:
    """J5 + J7: subreddit -> neighborhood -> borough."""
    rows = [(s, n, _NB_BOROUGH[n]) for s, n in SUBREDDITS]
    return spark.createDataFrame(
        rows, "subreddit string, neighborhood string, sub_borough string"
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
    """

    def _c(name: str, typ: str = "string") -> F.Column:
        return F.col(name) if name in records.columns else F.lit(None).cast(typ)

    sub_c, zip_c, text_c = _c(subreddit_col), _c(zip_col), _c(text_col)
    lat_c, lon_c = _c(lat_col, "double"), _c(lon_col, "double")
    sub = F.broadcast(
        subreddit_dim(spark).select(
            F.col("subreddit").alias("__sub"),
            F.col("neighborhood").alias("sub_nbhd"),
            "sub_borough",
        )
    )
    bbox = F.broadcast(
        neighborhood_dim(spark).select(
            F.col("neighborhood").alias("geo_nbhd"),
            F.col("borough").alias("geo_borough"),
            "lat_min",
            "lat_max",
            "lon_min",
            "lon_max",
        )
    )
    nz = F.broadcast(
        neighborhood_zip_dim(spark).select(
            F.col("zip").alias("__zip"),
            F.col("neighborhood").alias("zip_nbhd"),
            F.col("borough").alias("zip_borough"),
        )
    )
    bz = F.broadcast(
        borough_zip_dim(spark).select(
            F.col("zip_prefix").alias("__zp"), F.col("borough").alias("pfx_borough")
        )
    )
    # alias -> (neighborhood, borough) is static Python data — building
    # the when-chain from the constants avoids a collect() Spark job.
    # The chain is emitted ONCE as two pre-join columns: inlining it into
    # the three output expressions tripled the generated-code size and
    # was the dominant Janino-compile cost of the whole cascade.
    text_lc = F.lower(text_c)
    alias_nbhd = F.lit(None).cast("string")
    alias_borough = F.lit(None).cast("string")
    # reverse-fold so earlier aliases in the table win ties
    for alias, nbhd in reversed(ALIASES):
        hit = F.instr(text_lc, alias) > 0
        alias_nbhd = F.when(hit, F.lit(nbhd)).otherwise(alias_nbhd)
        alias_borough = F.when(hit, F.lit(_NB_BOROUGH[nbhd])).otherwise(alias_borough)

    out = (
        records.withColumns(
            {"__alias_nbhd": alias_nbhd, "__alias_borough": alias_borough}
        )
        .join(sub, F.lower(sub_c) == F.col("__sub"), "left")
        .join(
            bbox,
            (lat_c >= F.col("lat_min"))
            & (lat_c <= F.col("lat_max"))
            & (lon_c >= F.col("lon_min"))
            & (lon_c <= F.col("lon_max")),
            "left",
        )
        .join(nz, zip_c == F.col("__zip"), "left")
        .join(bz, F.substring(zip_c, 1, 3) == F.col("__zp"), "left")
    )
    neighborhood = F.coalesce(
        F.col("sub_nbhd"), F.col("geo_nbhd"), F.col("zip_nbhd"), F.col("__alias_nbhd")
    )
    borough = F.coalesce(
        F.col("sub_borough"),
        F.col("geo_borough"),
        F.col("zip_borough"),
        F.col("pfx_borough"),
        F.col("__alias_borough"),
    )
    location_source = (
        F.when(F.col("sub_nbhd").isNotNull(), "subreddit")
        .when(F.col("geo_nbhd").isNotNull(), "coordinates")
        .when(F.col("zip_nbhd").isNotNull() | F.col("pfx_borough").isNotNull(), "zip")
        .when(F.col("__alias_nbhd").isNotNull(), "text_extraction")
        .otherwise(None)
    )
    return out.select(
        *[F.col(c) for c in records.columns],
        neighborhood.alias("neighborhood"),
        borough.alias("borough"),
        location_source.alias("location_source"),
    )
