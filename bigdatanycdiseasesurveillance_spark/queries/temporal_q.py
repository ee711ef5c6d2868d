"""Temporal-shape queries: SCD2 change history and binned interval
joins. The reference's upsert path (psql_db_client.py:369-417) keeps
only last-writer state; these are the corresponding history-preserving
warehouse shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import table


@register(
    "scd2_user_type_history",
    oracle="""
        WITH o AS (
            SELECT user_id, event_type, ts,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        ), changes AS (
            SELECT user_id, event_type, ts AS valid_from
            FROM o
            WHERE prev_type IS NULL OR event_type <> prev_type
        )
        SELECT user_id, event_type, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY valid_from) AS valid_to,
               lead(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY valid_from) IS NULL AS is_current
        FROM changes
    """,
    tags=("cdc", "scd2", "window"),
)
def scd2_user_type_history(spark, sf_dir):
    """SCD2 assembly: compress each user's event stream into validity
    intervals of their event_type (change rows only), valid_from/
    valid_to half-open, open-ended row flagged current. Two windows on
    the same (user_id, time) partitioning — one shuffle, both sorts
    reuse it. The history-preserving complement of the engine's
    last-writer-wins upsert."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "event_type", F.col("ts").alias("valid_from"))
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


_IV_MOD = 97  # event_id % 97 == 0 spawns a maintenance window
_IV_HOURS = 2


@register(
    "join_interval_binned",
    oracle=f"""
        WITH win AS (
            SELECT event_id AS w_id, ts AS w_start,
                   ts + INTERVAL {_IV_HOURS} HOURS AS w_end
            FROM events WHERE event_id % {_IV_MOD} = 0
        )
        SELECT w.w_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
               ROUND(SUM(e.value), 2) AS sum_value
        FROM win w JOIN events e
          ON e.ts >= w.w_start AND e.ts < w.w_end
        GROUP BY w.w_id
    """,
    tags=("join", "interval", "range"),
)
def join_interval_binned(spark, sf_dir):
    """Interval-containment join WITHOUT a cross product: each window
    explodes into the hour buckets it covers, events key by their hour
    bucket, candidates come from the bucket equi-join, exact
    containment filters after. The theta join the oracle runs (and a
    naive engine would run) is O(windows x events); the binned plan
    shuffles each side once on the bucket key — the standard interval-
    join scale trick (cf. range-join binning in Databricks/Flink).
    Bucket width = window length, so each window spans <= 3 buckets and
    candidate inflation is bounded."""
    e = table(spark, sf_dir, "events")
    win = e.filter(F.col("event_id") % _IV_MOD == 0).select(
        F.col("event_id").alias("w_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr(f"INTERVAL {_IV_HOURS} HOURS")).alias("w_end"),
    )
    width = 3600 * _IV_HOURS  # bucket width == window length, epoch grid

    def bkt(col):
        return F.floor(F.unix_timestamp(col) / F.lit(width)).cast("long")

    wb = win.select(
        "w_id",
        "w_start",
        "w_end",
        F.explode(F.sequence(bkt(F.col("w_start")), bkt(F.col("w_end")))).alias("bkt"),
    )
    eb = e.select(
        "event_id", "user_id", "value", "ts", bkt(F.col("ts")).alias("bkt")
    )
    cand = wb.join(eb, "bkt").filter(
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end"))
    )
    return (
        cand.select("w_id", "event_id", "user_id", "value")
        .distinct()
        .groupBy("w_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
