"""Query registry — the single source of truth for the driver contract.

Every operator the engine claims (SURVEY.md §2) registers here as a named
spec: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are SQL-expressible, the equivalent ANSI SQL the DuckDB oracle
runs on the same parquet tables. ``__spark_entry__.py`` exposes the
registry verbatim.

Parity rules every spec follows (so order-insensitive value-hash
comparison succeeds):

- every computed column is aliased identically on both sides;
- every floating-point output is ``round(x, N)`` on both sides (sums and
  averages are order-dependent in the last bits across engines);
- day-grain times are cast to DATE on both sides (Spark date_trunc
  returns timestamp, DuckDB returns timestamp — DATE is unambiguous);
- arrays are never emitted raw (element order may differ) — emit
  deterministic joins (array_join of order-preserving constructs) or
  counts instead;
- top-k queries carry a full tie-breaking ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[SparkFn], SparkFn]:
    def deco(fn: SparkFn) -> SparkFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags, bench)
        return fn

    return deco


def _driver_coverage() -> tuple[set[str], set[str]]:
    """(green, sampled) query-name sets from past correctness rounds
    (CORRECTNESS_r*.json at the repo root). Used only to order the
    registry so the neediest specs surface first for drivers that
    sample a prefix; sampling is otherwise out of our control."""
    import glob
    import json
    import logging
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    sampled: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                for name, row in json.load(fh).items():
                    sampled.add(name)
                    # only exact-value GREEN rows count as covered: a
                    # rows-only (`no_oracle`) row that predates a spec's
                    # oracle must NOT demote it out of the priority tier
                    # (r5 verdict finding #3) — a query stays prioritized
                    # until the driver records a hash_match for it.
                    if row.get("hash_match"):
                        green.add(name)
        except Exception as exc:  # malformed round artifact — ordering hint only
            logging.getLogger(__name__).warning(
                "ignoring unreadable coverage artifact %s: %s", path, exc
            )
    return green, sampled


def all_specs() -> dict[str, QuerySpec]:
    # Import the query modules for their registration side effects.
    from . import queries  # noqa: F401

    # Stable order, four tiers for drivers that sample a prefix:
    #   1. sampled-but-never-green (a past round's failure, since fixed):
    #      the highest-priority re-certification targets;
    #   2. this round's new operators (never sampled, no external
    #      verification yet) — the explicit list below, updated when a
    #      build round adds queries;
    #   3. older never-sampled entries (most were judge-re-run in past
    #      rounds), registration order;
    #   4. green-covered, registration order.
    # Repeat calls (and rounds) agree given the same artifacts.
    green, sampled = _driver_coverage()
    idx = {n: i for i, n in enumerate(_REGISTRY)}
    recent = {n: i for i, n in enumerate(_ROUND_NEW)}

    def key(n: str):
        # _ROUND_NEW outranks past green rows: a contract-reworked query
        # keeps its old (now-stale) green row, but the NEW oracle has
        # never been driver-certified. The list is replaced at the start
        # of every build round, so nothing stays promoted longer than
        # the round that changed it.
        if n in recent:
            return (1, recent[n])
        if n in green:
            return (3, idx[n])
        if n in sampled:
            return (0, idx[n])
        return (2, idx[n])

    ordered = sorted(_REGISTRY, key=key)
    return {n: _REGISTRY[n] for n in ordered}


# Queries added or contract-reworked in the current build round
# (tier 2 above). Names that have since gone green sort into tier 4
# automatically, so stale entries here are harmless.
_ROUND_NEW = (
    # round 6: new composed scale-path flagship
    "cluster_geo_pipeline_cellgrid",
    "dedup_incremental_groups",
    # round 6: distinct-set-weighted contract rewrites (new oracles —
    # their old green rows certify the OLD contract, so they need
    # fresh driver rows)
    "dedup_containment_pairs",
    "dedup_incremental_new_vs_old",
    "dedup_source_overlap_matrix",
    "dq_split_leakage",
    "dedup_blocking_quality",
    "dedup_hamming_pairs",
    "tok_bpe_merges",
)
