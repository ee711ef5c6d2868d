"""Forecasting query corpus (M10-M12 / U2)."""

from __future__ import annotations

from ..operators import aggregations as agg
from ..operators import forecast as FC
from ..registry import register
from ..tables import table


def _daily(spark, sf_dir):
    return agg.daily_counts(table(spark, sf_dir, "events"), "ts", ["event_type"])


@register(
    "forecast_linear_trend",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   event_type, COUNT(*) AS cnt
            FROM events GROUP BY 1, 2
        ), fit AS (
            SELECT event_type,
                   regr_slope(CAST(cnt AS DOUBLE),
                              CAST(date_diff('day', DATE '2024-01-01', day) AS DOUBLE)) AS slope,
                   regr_intercept(CAST(cnt AS DOUBLE),
                                  CAST(date_diff('day', DATE '2024-01-01', day) AS DOUBLE)) AS icpt,
                   MAX(date_diff('day', DATE '2024-01-01', day)) AS mx
            FROM daily GROUP BY 1
        )
        SELECT event_type,
               CAST(h AS BIGINT) AS horizon_day,
               ROUND(GREATEST(0.0, icpt + slope * (mx + h)), 4) AS predicted
        FROM fit, generate_series(1, 7) t(h)
    """,
    tags=("forecast", "M10"),
)
def forecast_linear_trend(spark, sf_dir):
    """M10-class forecast, fully native: per-group OLS trend via
    regr_slope/regr_intercept aggregates, 7-day horizon, clipped at 0."""
    return FC.linear_forecast(_daily(spark, sf_dir), ["event_type"])


@register(
    "forecast_grouped_pandas",
    oracle=None,  # per-group model fit (OLS + day-of-week offsets) via
    # applyInPandas — the reference's intended distributed design; golden
    # determinism check in tests/test_forecast.py.
    tags=("forecast", "U2"),
)
def forecast_grouped_pandas(spark, sf_dir):
    """U2 as intended: groupBy(keys).applyInPandas(model fit) — Arrow-
    batched per-group fitting (deterministic trend+DOW model standing in
    for Prophet/SARIMA)."""
    return FC.grouped_forecast_applyInPandas(_daily(spark, sf_dir))
