"""The driver's correctness gate, run locally: every registered query
with an oracle is executed in Spark and DuckDB on the same parquet and
compared as an order-insensitive normalized row multiset."""

from __future__ import annotations

import pytest

from bigdatanycdiseasesurveillance_spark.registry import all_specs

from .helpers import assert_parity, duck_con

SPECS = all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, con, name):
    spec = SPECS[name]
    assert_parity(spec.fn(spark, sf_dir), spec.oracle, con, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_approx_distinct_error_bound(spark, sf_dir):
    """HLL++ estimate must sit within 5x the configured rsd of exact."""
    from bigdatanycdiseasesurveillance_spark.registry import all_specs

    rows = all_specs()["agg_approx_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        exact, approx = r["exact_users"], r["approx_users"]
        assert abs(approx - exact) <= max(1, 0.05 * exact), r


def test_langid_fast_equals_dataframe_variant(spark, sf_dir):
    """mapInPandas-scored language-ID must match the explode/join/window
    formulation exactly (same normalization, profiles, tie-breaks)."""
    from bigdatanycdiseasesurveillance_spark.operators.text_analysis import (
        langid_trigram,
        langid_trigram_fast,
    )
    from bigdatanycdiseasesurveillance_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    a = sorted(map(tuple, langid_trigram(docs).collect()))
    b = sorted(map(tuple, langid_trigram_fast(docs).collect()))
    assert a == b
