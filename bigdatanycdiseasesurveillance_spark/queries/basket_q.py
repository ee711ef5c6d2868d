"""Association and sequence shapes: market-basket lift, activity
streaks (gaps-and-islands), deterministic mode, and a forward as-of
join with a tolerance window.

Scale notes: basket pairs come from the within-order self-join (fan
bounded by basket size squared, never corpus size), and the per-item
support table is item-count rows, so it broadcasts. Streaks use the
day-minus-rank islands trick — one user-keyed window, no self-join.
The forward as-of is the same union+single-window shape as the
backward one (one shuffle per side on user_id); tolerance is a
post-filter, costing nothing extra.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.time_funcs import epoch_sec
from ..registry import register
from ..tables import table

_MIN_SUPPORT = 3
_ASOF_TOL_S = 3600


@register(
    "market_basket_lift",
    oracle=f"""
        WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        n AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lp),
        item AS (SELECT l_partkey, COUNT(*) AS nx FROM lp GROUP BY l_partkey),
        pair AS (
            SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS nxy
            FROM lp a JOIN lp b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        )
        SELECT p.x, p.y,
               CAST(p.nxy AS BIGINT) AS n_orders_both,
               p.nxy * 1.0 / n.n AS support,
               p.nxy * 1.0 / ix.nx AS confidence_x_y,
               (p.nxy * 1.0 * n.n) / (ix.nx * 1.0 * iy.nx) AS lift
        FROM pair p
        JOIN item ix ON p.x = ix.l_partkey
        JOIN item iy ON p.y = iy.l_partkey, n
        WHERE p.nxy >= {_MIN_SUPPORT}
    """,
    tags=("basket", "association", "join"),
)
def market_basket_lift(spark, sf_dir):
    """Market-basket association rules over co-purchased parts:
    support, confidence, and lift for every pair co-occurring in >= 3
    orders. Pair generation is the within-order self-join (quadratic
    only in basket size), per-item supports are an item-count table
    joined by broadcast, and all three metrics are raw exact-integer
    divisions — identical doubles in any engine. The relational form
    of Apriori's first level; higher levels iterate the same join on
    the surviving pairs."""
    lp = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n = lp.agg(F.countDistinct("l_orderkey").alias("n"))
    item = lp.groupBy("l_partkey").agg(F.count("*").alias("nx"))
    a = lp.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("x"))
    b = lp.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("y"))
    pair = (
        a.join(b, "k")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("nxy"))
        .filter(F.col("nxy") >= _MIN_SUPPORT)
    )
    ix = item.select(F.col("l_partkey").alias("x"), F.col("nx").alias("nx_x"))
    iy = item.select(F.col("l_partkey").alias("y"), F.col("nx").alias("nx_y"))
    return (
        pair.join(F.broadcast(ix), "x")
        .join(F.broadcast(iy), "y")
        .crossJoin(F.broadcast(n))
        .select(
            "x",
            "y",
            F.col("nxy").cast("long").alias("n_orders_both"),
            (F.col("nxy") * F.lit(1.0) / F.col("n")).alias("support"),
            (F.col("nxy") * F.lit(1.0) / F.col("nx_x")).alias("confidence_x_y"),
            (
                (F.col("nxy") * F.lit(1.0) * F.col("n"))
                / (F.col("nx_x") * F.lit(1.0) * F.col("nx_y"))
            ).alias("lift"),
        )
    )


@register(
    "win_streaks",
    oracle="""
        WITH d AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', ts) AS DATE) AS day
            FROM events
        ),
        g AS (
            SELECT user_id, day,
                   day - CAST(row_number() OVER (PARTITION BY user_id
                                                 ORDER BY day) AS INTEGER) AS grp
            FROM d
        ),
        s AS (
            SELECT user_id, grp, COUNT(*) AS streak_len
            FROM g GROUP BY user_id, grp
        )
        SELECT user_id,
               CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
               CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
               CAST(COUNT(*) AS BIGINT) AS n_streaks
        FROM s GROUP BY user_id
    """,
    tags=("window", "islands", "sequence"),
)
def win_streaks(spark, sf_dir):
    """Longest consecutive-active-day streak per user — the
    gaps-and-islands pattern: on the distinct (user, day) matrix,
    day minus row_number is constant within a consecutive run, so
    islands fall out of one groupBy on that difference. One user-keyed
    window over the distinct-compressed activity table; complements
    `win_session_window`, which islands on time gaps instead of
    calendar days."""
    e = table(spark, sf_dir, "events")
    d = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    s = g.groupBy("user_id", "grp").agg(F.count("*").alias("streak_len"))
    return s.groupBy("user_id").agg(
        F.sum("streak_len").cast("long").alias("n_active_days"),
        F.max("streak_len").cast("long").alias("longest_streak"),
        F.count("*").cast("long").alias("n_streaks"),
    )


@register(
    "agg_mode_per_group",
    oracle="""
        WITH c AS (
            SELECT user_id, event_type, COUNT(*) AS cnt
            FROM events GROUP BY user_id, event_type
        )
        SELECT user_id,
               event_type AS mode_type,
               CAST(cnt AS BIGINT) AS mode_count
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY cnt DESC, event_type) AS rk
            FROM c
        )
        WHERE rk = 1
    """,
    tags=("agg", "mode", "window"),
)
def agg_mode_per_group(spark, sf_dir):
    """Statistical mode per group with a DETERMINISTIC tie-break
    (highest count, then lexicographically smallest value) — built-in
    mode() functions break ties engine-specifically, so the engine
    computes it as count + window-rank, which is also the shape that
    scales: one map-side-combined groupBy, then a window over the tiny
    (group, value) count table."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.desc("cnt"), F.asc("event_type"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("cnt").cast("long").alias("mode_count"),
        )
    )


@register(
    "join_asof_forward_tolerance",
    oracle=f"""
        WITH p AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        c0 AS (
            SELECT user_id, ts, MIN(event_id) AS event_id
            FROM events WHERE event_type = 'click'
            GROUP BY user_id, ts
        )
        SELECT p.event_id, p.user_id,
               CASE WHEN epoch(c.ts) - epoch(p.ts) <= {_ASOF_TOL_S}
                    THEN c.event_id END AS next_click_id,
               CASE WHEN epoch(c.ts) - epoch(p.ts) <= {_ASOF_TOL_S}
                    THEN epoch(c.ts) - epoch(p.ts) END AS wait_seconds
        FROM p ASOF LEFT JOIN c0 c
          ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
    tags=("join", "asof", "tolerance"),
)
def join_asof_forward_tolerance(spark, sf_dir):
    """Forward as-of with tolerance: each purchase matched to the
    user's NEXT click, nulled when it arrives more than an hour later
    (the reaction-time join). Same union + single-window shape as the
    backward as-of — tag both streams, sort descending within user,
    carry the last-seen click — so one shuffle per side; the
    tolerance is a residual CASE, not a join condition, keeping the
    join purely equi + sort. Clicks are deduped to min event_id per
    (user, ts) first so the as-of choice is deterministic under
    timestamp ties in both engines."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    p = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("event_id"))
    )
    tagged = p.select(
        "user_id", "ts", F.col("event_id").alias("p_id"), F.lit(None).cast("long").alias("c_id")
    ).unionByName(
        c.select(
            "user_id", "ts", F.lit(None).cast("long").alias("p_id"), F.col("event_id").alias("c_id")
        )
    )
    # descending scan: the last click seen has the smallest ts >= current
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.asc_nulls_last("c_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        tagged.withColumn("next_c_id", F.last("c_id", ignorenulls=True).over(w))
        .withColumn("next_c_ts", F.last(F.when(F.col("c_id").isNotNull(), F.col("ts")), ignorenulls=True).over(w))
        .filter(F.col("p_id").isNotNull())
    )
    gap = epoch_sec("next_c_ts") - epoch_sec("ts")
    within = gap <= F.lit(float(_ASOF_TOL_S))
    return out.select(
        F.col("p_id").alias("event_id"),
        "user_id",
        F.when(within, F.col("next_c_id")).alias("next_click_id"),
        F.when(within, gap).alias("wait_seconds"),
    )
