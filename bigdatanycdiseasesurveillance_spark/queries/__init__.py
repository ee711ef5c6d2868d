"""Query corpus: every SURVEY.md §2 operator wired to the synthetic
star schema, each with a DuckDB oracle when SQL-expressible.

Importing this package registers all specs (see ..registry).
"""

from . import (  # noqa: F401
    analytics_q,
    core_agg,
    core_join,
    core_window,
    dedup_q,
    domain_q,
    forecast_q,
    mm_cluster_q,
    scalar,
    similarity_q,
    streaming_q,
    text_q,
    tpch,
)
