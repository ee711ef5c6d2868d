"""Unit tests for the Chroma filter-dict -> Column compiler."""

from __future__ import annotations

import pytest

from bigdatanycdiseasesurveillance_spark.functions.chroma_filter import (
    where_document_to_column,
    where_to_column,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "en", 100, "alpha beta"),
            (2, "en", 250, "beta gamma"),
            (3, "fr", 50, "gamma delta"),
            (4, "de", 400, "alpha delta"),
        ],
        "id long, lang string, n long, text string",
    )


def ids(df, cond):
    return sorted(r["id"] for r in df.filter(cond).collect())


def test_bare_value_is_eq(df):
    assert ids(df, where_to_column({"lang": "en"})) == [1, 2]


def test_implicit_and_across_keys(df):
    assert ids(df, where_to_column({"lang": "en", "n": {"$gte": 200}})) == [2]


def test_comparators(df):
    assert ids(df, where_to_column({"n": {"$gt": 100}})) == [2, 4]
    assert ids(df, where_to_column({"n": {"$lte": 100}})) == [1, 3]
    assert ids(df, where_to_column({"lang": {"$ne": "en"}})) == [3, 4]
    assert ids(df, where_to_column({"lang": {"$in": ["fr", "de"]}})) == [3, 4]
    assert ids(df, where_to_column({"lang": {"$nin": ["fr", "de"]}})) == [1, 2]


def test_nested_and_or(df):
    w = {
        "$or": [
            {"lang": "fr"},
            {"$and": [{"lang": "en"}, {"n": {"$lt": 200}}]},
        ]
    }
    assert ids(df, where_to_column(w)) == [1, 3]


def test_where_document_composition(df):
    wd = {
        "$or": [
            {"$and": [{"$contains": "alpha"}, {"$not_contains": "beta"}]},
            {"$contains": "gamma"},
        ]
    }
    assert ids(df, where_document_to_column(wd)) == [2, 3, 4]


def test_rejects_unknown_operators(df):
    with pytest.raises(ValueError):
        where_to_column({"$xor": []})
    with pytest.raises(ValueError):
        where_to_column({"n": {"$near": 5}})
    with pytest.raises(ValueError):
        where_to_column({})
    with pytest.raises(ValueError):
        where_document_to_column({"$regex": "x"})
