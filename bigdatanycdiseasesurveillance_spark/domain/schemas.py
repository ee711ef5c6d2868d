"""Explicit StructTypes for the reference's source record shapes
(SURVEY §1.3) and the unified silver table (§1.2).

The reference infers schemas from raw JSON at runtime
(spark.sql.streaming.schemaInference,
reference: src/spark_consumers/relevance_consumer.py:94) and then
bypasses typing by handling JSON strings. Explicit schemas make parsing
deterministic, enable predicate pushdown on typed columns, and catch
drift at ingest instead of mid-pipeline.
"""

from __future__ import annotations

from pyspark.sql import types as T

# reference: src/scrapers/redditscraper.py:138-149
REDDIT_POST = T.StructType(
    [
        T.StructField("post_id", T.StringType(), False),
        T.StructField("subreddit", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("created_utc", T.TimestampType(), True),
        T.StructField("score", T.IntegerType(), True),
        T.StructField("num_comments", T.IntegerType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("scraped_at", T.TimestampType(), True),
    ]
)

# reference: src/scrapers/bluesky/scraper.py:118-143
BLUESKY_POST = T.StructType(
    [
        T.StructField("platform", T.StringType(), True),
        T.StructField("post_id", T.StringType(), False),
        T.StructField("author", T.StringType(), True),
        T.StructField("author_did", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("scraped_at", T.TimestampType(), True),
        T.StructField("reply_count", T.IntegerType(), True),
        T.StructField("repost_count", T.IntegerType(), True),
        T.StructField("like_count", T.IntegerType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("hashtags", T.ArrayType(T.StringType()), True),
    ]
)

# reference: src/scrapers/scraper_311.py:53-68 — note lat/lon are
# STRINGS in the source payload; normalization casts them
NYC_311 = T.StructType(
    [
        T.StructField("source", T.StringType(), True),
        T.StructField("id", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField("zip", T.StringType(), True),
                    T.StructField("lat", T.StringType(), True),
                    T.StructField("lon", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("status", T.StringType(), True),
        T.StructField("scraped_at", T.TimestampType(), True),
    ]
)

# reference: src/scrapers/scraper_rss.py:33-40 — published is an
# RFC-822 string, exercises to_timestamp parsing
RSS_ARTICLE = T.StructType(
    [
        T.StructField("source", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("link", T.StringType(), True),
        T.StructField("published", T.StringType(), True),
        T.StructField("summary", T.StringType(), True),
        T.StructField("scraped_at", T.TimestampType(), True),
    ]
)

# reference: src/scrapers/nyc_covid_rsv_flu_official_scraper.py:20-29
RESPIRATORY_METRIC = T.StructType(
    [
        T.StructField("date", T.TimestampType(), True),
        T.StructField("metric", T.StringType(), True),
        T.StructField("submetric", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("display", T.StringType(), True),
    ]
)

# Unified silver table — reference: src/database/psql_db_client.py:112-151.
# diseases/symptoms are native arrays (the reference round-trips them
# through JSON strings; SURVEY §1.2 flags that as a defect to avoid).
DISEASE_EVENTS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("text_content", T.StringType(), True),
        T.StructField("is_relevant", T.BooleanType(), True),
        T.StructField("diseases", T.ArrayType(T.StringType()), True),
        T.StructField("symptoms", T.ArrayType(T.StringType()), True),
        T.StructField("severity", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("is_duplicate", T.BooleanType(), True),
        T.StructField("dedup_tier", T.StringType(), True),
        T.StructField("similarity_score", T.DoubleType(), True),
        T.StructField("borough", T.StringType(), True),
        T.StructField("neighborhood", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("location_source", T.StringType(), True),
        T.StructField("extracted_locations", T.ArrayType(T.StringType()), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("processed_at", T.TimestampType(), True),
        T.StructField("embedding_id", T.StringType(), True),
        T.StructField("raw_data", T.StringType(), True),
    ]
)
