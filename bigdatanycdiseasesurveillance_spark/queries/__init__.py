"""Query corpus: every SURVEY.md §2 operator wired to the synthetic
star schema, each with a DuckDB oracle when SQL-expressible.

Importing this package registers all specs (see ..registry).
"""

# Registration order matters: the round driver's correctness gate walks
# the registry in insertion order and covers a bounded prefix per round
# (round 1 stopped at exactly 50 of 74). The modules whose queries lacked
# driver rows in CORRECTNESS_r01.json register first so round 2 covers
# them; prior-round-green modules follow.
from . import (  # noqa: F401
    similarity_q,
    streaming_q,
    text_q,
    tpch,
    mm_cluster_q,
    packing_q,
    streaming_extra_q,
    dedup_extra_q,
    reshape_q,
    analytics_q,
    core_agg,
    core_join,
    core_window,
    dedup_q,
    domain_q,
    forecast_q,
    scalar,
    curation_q,
    temporal_q,
    quality_q,
    maintenance_q,
    text_features_q,
    editsim_q,
    graph_q,
    analytics_extra_q,
    cohort_q,
    curation_pipeline_q,
    basket_q,
    sketch_q,
    # round-3 modules register AFTER the round-2 corpus: within the
    # never-driver-sampled tier (registry.all_specs orders that tier
    # first) the oldest uncovered queries take the sampled prefix, so
    # driver coverage closes oldest-first across rounds
    geo_pipeline_q,
    ir_q,
    lm_q,
    # round-4 modules
    corpus_export_q,
    # round-12 modules
    sampling_design_q,
)
