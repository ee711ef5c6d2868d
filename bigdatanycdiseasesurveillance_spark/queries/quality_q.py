"""Data-quality expectation checks, k-anonymity profiling, and exact
quantile binning — the validation tier a training-data pipeline runs
before a corpus snapshot is blessed (cf. Great Expectations / Deequ
check suites; the reference validates ad hoc in consumer code, e.g.
relevance_consumer's guard clauses).

Scale notes: every expectation is a single-pass aggregate over one
table (map-side partial, one-row result); the referential-integrity
check is the only join, and its fact side never expands (left join to
a unique key, at 100 TB a runtime bloom filter on the probe side keeps
the shuffle proportional to the orphan candidates — see
plans/inspect.py bloom pins). k-anonymity is one groupBy on the
quasi-identifier tuple plus a one-row rollup. Quantile binning's
exact-cutpoint path does a global sort (oracle-parity shape, fine to
sf0.1); the documented scale path swaps in approx_percentile cutpoints
which needs no sort at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_K_ANON = 10


@register(
    "dq_expectations",
    oracle="""
        SELECT 'null_frac:orders.o_custkey' AS check_name,
               ROUND(AVG(CASE WHEN o_custkey IS NULL THEN 1.0 ELSE 0.0 END), 6) AS metric,
               CAST(0.0 AS DOUBLE) AS threshold,
               ROUND(AVG(CASE WHEN o_custkey IS NULL THEN 1.0 ELSE 0.0 END), 6) <= 0.0 AS passed
        FROM orders
        UNION ALL
        SELECT 'null_frac:events.value',
               ROUND(AVG(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END), 6),
               CAST(0.05 AS DOUBLE),
               ROUND(AVG(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END), 6) <= 0.05
        FROM events
        UNION ALL
        SELECT 'dup_frac:customer.c_custkey',
               ROUND(1.0 - COUNT(DISTINCT c_custkey) * 1.0 / COUNT(*), 6),
               CAST(0.0 AS DOUBLE),
               ROUND(1.0 - COUNT(DISTINCT c_custkey) * 1.0 / COUNT(*), 6) <= 0.0
        FROM customer
        UNION ALL
        SELECT 'range_viol:lineitem.l_discount',
               ROUND(AVG(CASE WHEN l_discount < 0.0 OR l_discount > 1.0
                              THEN 1.0 ELSE 0.0 END), 6),
               CAST(0.0 AS DOUBLE),
               ROUND(AVG(CASE WHEN l_discount < 0.0 OR l_discount > 1.0
                              THEN 1.0 ELSE 0.0 END), 6) <= 0.0
        FROM lineitem
        UNION ALL
        SELECT 'domain_viol:orders.o_orderstatus',
               ROUND(AVG(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                              THEN 1.0 ELSE 0.0 END), 6),
               CAST(0.0 AS DOUBLE),
               ROUND(AVG(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                              THEN 1.0 ELSE 0.0 END), 6) <= 0.0
        FROM orders
        UNION ALL
        SELECT 'orphan_frac:lineitem.l_orderkey',
               ROUND(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1.0 ELSE 0.0 END)
                     / COUNT(*), 6),
               CAST(0.0 AS DOUBLE),
               ROUND(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1.0 ELSE 0.0 END)
                     / COUNT(*), 6) <= 0.0
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    tags=("quality", "validation", "agg", "join"),
)
def dq_expectations(spark, sf_dir):
    """Expectation suite: one row per check, every metric a violation
    fraction in [0,1] compared against its threshold (passed = metric
    <= threshold, compared on the rounded value so both engines gate
    identically). Covers null fraction, key uniqueness, value range,
    accepted domain, and referential integrity — each a single-pass
    aggregate; RI is one left join against the unique build side."""
    orders = table(spark, sf_dir, "orders")
    events = table(spark, sf_dir, "events")
    customer = table(spark, sf_dir, "customer")
    lineitem = table(spark, sf_dir, "lineitem")

    def check(name: str, df: DataFrame, metric, threshold: float) -> DataFrame:
        m = F.round(metric, 6)
        return df.agg(
            F.lit(name).alias("check_name"),
            m.alias("metric"),
            F.lit(threshold).alias("threshold"),
            (m <= F.lit(threshold)).alias("passed"),
        )

    null_frac = lambda c: F.avg(F.when(F.col(c).isNull(), 1.0).otherwise(0.0))  # noqa: E731
    ri = lineitem.join(
        orders.select("o_orderkey"),
        lineitem.l_orderkey == F.col("o_orderkey"),
        "left",
    )
    return (
        check("null_frac:orders.o_custkey", orders, null_frac("o_custkey"), 0.0)
        .unionAll(check("null_frac:events.value", events, null_frac("value"), 0.05))
        .unionAll(
            check(
                "dup_frac:customer.c_custkey",
                customer,
                1.0 - F.countDistinct("c_custkey") * F.lit(1.0) / F.count("*"),
                0.0,
            )
        )
        .unionAll(
            check(
                "range_viol:lineitem.l_discount",
                lineitem,
                F.avg(
                    F.when((F.col("l_discount") < 0.0) | (F.col("l_discount") > 1.0), 1.0).otherwise(0.0)
                ),
                0.0,
            )
        )
        .unionAll(
            check(
                "domain_viol:orders.o_orderstatus",
                orders,
                F.avg(
                    F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1.0).otherwise(0.0)
                ),
                0.0,
            )
        )
        .unionAll(
            check(
                "orphan_frac:lineitem.l_orderkey",
                ri,
                F.sum(F.when(F.col("o_orderkey").isNull(), 1.0).otherwise(0.0)) / F.count("*"),
                0.0,
            )
        )
    )


@register(
    "dq_k_anonymity",
    oracle=f"""
        WITH g AS (
            SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
            FROM customer GROUP BY c_nationkey, c_mktsegment
        )
        SELECT CAST(MIN(cnt) AS BIGINT) AS k_min,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN cnt < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT) AS n_below_k,
               ROUND(SUM(CASE WHEN cnt < {_K_ANON} THEN cnt ELSE 0 END) * 1.0
                     / SUM(cnt), 6) AS frac_rows_below_k
        FROM g
    """,
    tags=("quality", "privacy", "agg"),
)
def dq_k_anonymity(spark, sf_dir):
    """k-anonymity profile over the (c_nationkey, c_mktsegment)
    quasi-identifier: smallest equivalence class, number of classes
    below k=10, and the fraction of rows they cover — the release
    gate a privacy-aware pipeline checks before publishing. One
    groupBy (map-side combined) plus a one-row rollup."""
    g = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )
    below = F.when(F.col("cnt") < _K_ANON, F.col("cnt")).otherwise(F.lit(0))
    return g.agg(
        F.min("cnt").cast("long").alias("k_min"),
        F.count("*").cast("long").alias("n_groups"),
        F.sum(F.when(F.col("cnt") < _K_ANON, 1).otherwise(0)).cast("long").alias("n_below_k"),
        F.round(F.sum(below) * F.lit(1.0) / F.sum("cnt"), 6).alias("frac_rows_below_k"),
    )


@register(
    "feat_quantile_binning",
    oracle="""
        WITH n AS (SELECT COUNT(*) AS n FROM orders),
        r AS (
            SELECT o_totalprice,
                   ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
            FROM orders
        ),
        cuts AS (
            SELECT MIN(CASE WHEN rn >= CEIL(0.25 * n) THEN o_totalprice END) AS c1,
                   MIN(CASE WHEN rn >= CEIL(0.50 * n) THEN o_totalprice END) AS c2,
                   MIN(CASE WHEN rn >= CEIL(0.75 * n) THEN o_totalprice END) AS c3
            FROM r, n
        )
        SELECT CASE WHEN o_totalprice <= c1 THEN 'q1'
                    WHEN o_totalprice <= c2 THEN 'q2'
                    WHEN o_totalprice <= c3 THEN 'q3'
                    ELSE 'q4' END AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(AVG(o_totalprice), 2) AS avg_price,
               ROUND(MIN(o_totalprice), 2) AS min_price,
               ROUND(MAX(o_totalprice), 2) AS max_price
        FROM orders, cuts
        GROUP BY bin
    """,
    tags=("features", "quantile", "window"),
)
def feat_quantile_binning(spark, sf_dir):
    """Quantile binning for feature engineering: exact quartile
    cutpoints (min value at or past rank ceil(p*n), fully tie-broken
    so both engines pick the identical data value) then a CASE bin
    assignment and per-bin profile. The exact path sorts once
    globally — the oracle-parity shape; at 100 TB swap the cutpoint
    CTE for approx_percentile (no sort, one pass) and keep the
    broadcast + CASE assignment unchanged, since cutpoints are a
    3-value broadcast either way."""
    orders = table(spark, sf_dir, "orders")
    n = orders.agg(F.count("*").alias("n"))
    r = orders.select(
        "o_totalprice",
        F.row_number()
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("rn"),
    )
    cut = lambda p, name: F.min(  # noqa: E731
        F.when(F.col("rn") >= F.ceil(F.lit(p) * F.col("n")), F.col("o_totalprice"))
    ).alias(name)
    cuts = r.crossJoin(F.broadcast(n)).agg(
        cut(0.25, "c1"), cut(0.50, "c2"), cut(0.75, "c3")
    )
    binned = orders.crossJoin(F.broadcast(cuts)).withColumn(
        "bin",
        F.when(F.col("o_totalprice") <= F.col("c1"), "q1")
        .when(F.col("o_totalprice") <= F.col("c2"), "q2")
        .when(F.col("o_totalprice") <= F.col("c3"), "q3")
        .otherwise("q4"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
