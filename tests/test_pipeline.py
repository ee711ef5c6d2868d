"""End-to-end pipeline (SURVEY §3.1 replacement) + gated NER operator."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from bigdatanycdiseasesurveillance_spark.domain.schemas import REDDIT_POST
from bigdatanycdiseasesurveillance_spark.operators.ner import extract_locations
from bigdatanycdiseasesurveillance_spark.pipeline import run_pipeline

VOCAB = dict(
    primary_vocab=("flu", "covid", "measles"),
    secondary_vocab=("fever", "cough", "rash"),
    hazard_vocab=("outbreak",),
)


def _post(i, text, sub="astoria", day=29):
    return {
        "post_id": f"p{i}",
        "subreddit": sub,
        "title": "t",
        "author": f"u{i}",
        "created_utc": f"2025-11-{day:02d}T12:00:00",
        "score": i,
        "num_comments": 0,
        "text": text,
        "url": f"https://r/{i}",
        "scraped_at": "2025-12-01T00:00:00",
    }


def test_pipeline_end_to_end(spark, tmp_path):
    bronze = tmp_path / "bronze"
    bronze.mkdir()
    posts = [
        _post(1, "flu going around astoria queens"),
        _post(2, "flu going around astoria queens"),  # exact dup of p1
        _post(3, "bad cough and fever in wburg", sub="williamsburg", day=30),
        _post(4, "nice weather today"),  # irrelevant
    ]
    (bronze / "a.json").write_text(json.dumps(posts[:2]))
    (bronze / "b.jsonl").write_text("\n".join(json.dumps(p) for p in posts[2:]))

    res = run_pipeline(
        spark,
        str(bronze),
        str(tmp_path / "out"),
        REDDIT_POST,
        ts_candidates=["created_utc", "scraped_at"],
        id_candidates=["post_id"],
        **VOCAB,
    )
    assert res.n_bronze == 4
    assert res.n_unique == 3  # p2 flagged duplicate
    assert res.n_relevant == 2  # p1, p3 (p2 dup, p4 irrelevant)

    silver = spark.read.parquet(res.silver_path)
    # date partitioning materialized as directories
    assert any(
        d.startswith("event_date=") for d in os.listdir(res.silver_path)
    )
    dup_flags = {r["id"]: r["is_duplicate"] for r in silver.collect()}
    assert dup_flags == {"p1": False, "p2": True, "p3": False, "p4": False}

    daily = {
        (str(r["event_date"]), r["borough"]): r["cnt"]
        for r in spark.read.parquet(res.gold_daily_path).collect()
    }
    assert daily == {("2025-11-29", "Queens"): 1, ("2025-11-30", "Brooklyn"): 1}

    sev = {r["severity"]: r["cnt"] for r in spark.read.parquet(res.gold_severity_path).collect()}
    assert sev == {"mild": 2}


def test_ner_operator_dictionary_fallback(spark):
    df = spark.createDataFrame(
        [
            (1, "meet me in wburg tomorrow"),
            (2, "flushing and astoria are both in queens"),
            (3, "no places here"),
            (4, None),
        ],
        "id long, text string",
    )
    rows = {r["id"]: r for r in extract_locations(df).collect()}
    backend = rows[1]["ner_backend"]
    assert backend in ("spacy", "dictionary")
    if backend == "dictionary":
        assert rows[1]["extracted_locations"] == ["wburg"]
        assert set(rows[2]["extracted_locations"]) == {"astoria", "flushing"}
        assert rows[3]["extracted_locations"] == []
        assert rows[4]["extracted_locations"] == []
