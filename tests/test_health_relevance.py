"""Golden tests for the reference health-relevance domain preset.

An independent plain-Python port of the reference UDF's text path
(reference: src/spark_consumers/relevance_consumer.py:124-264) is the
oracle; the Spark column-expression implementation must agree on every
output for both hand-picked worked examples (the TICKET_3.2 fixtures)
and the whole sf0.001 documents corpus.
"""

from __future__ import annotations

from bigdatanycdiseasesurveillance_spark.domain.health_relevance import (
    DISEASE_KEYWORDS,
    HAZARD_KEYWORDS,
    MILD_WORDS,
    MODERATE_WORDS,
    SEVERE_WORDS,
    SYMPTOM_KEYWORDS,
    analyze_health_relevance,
)
from bigdatanycdiseasesurveillance_spark.tables import table


def reference_analyze(text: str) -> dict:
    """Direct port of the reference's keyword_analysis branch."""
    stripped = text.strip()
    if not stripped or len(stripped) < 5:
        return {
            "diseases": "",
            "symptoms": "",
            "n_diseases": 0,
            "n_symptoms": 0,
            "has_hazard": any(h in stripped.lower() for h in HAZARD_KEYWORDS),
            "is_relevant": False,
            "severity": "unknown",
            "confidence": 0.0,
            "reason": "insufficient_text",
        }
    t = stripped.lower()
    diseases = [n for n, kws in DISEASE_KEYWORDS.items() if any(k in t for k in kws)]
    symptoms = [s for s in SYMPTOM_KEYWORDS if s in t]
    hazard = any(h in t for h in HAZARD_KEYWORDS)
    relevant = len(diseases) > 0 or len(symptoms) >= 2 or hazard
    if any(w in t for w in SEVERE_WORDS):
        severity = "severe"
    elif any(w in t for w in MODERATE_WORDS):
        severity = "moderate"
    elif any(w in t for w in MILD_WORDS):
        severity = "mild"
    else:
        severity = "unknown"
    if relevant:
        conf = 0.6
        if diseases:
            conf += 0.1 * min(len(diseases), 2)
        if len(symptoms) >= 2:
            conf += 0.05 * min(len(symptoms), 3)
        if severity != "unknown":
            conf += 0.05
        conf = min(conf, 0.90)
    else:
        conf = 0.2
    return {
        "diseases": ",".join(diseases),
        "symptoms": ",".join(symptoms),
        "n_diseases": len(diseases),
        "n_symptoms": len(symptoms),
        "has_hazard": hazard,
        "is_relevant": relevant,
        "severity": severity,
        "confidence": round(conf, 2),
        "reason": "keyword_analysis",
    }


WORKED_EXAMPLES = [
    # TICKET_3.2_SUMMARY.md worked fixtures + formula edge cases
    "Flu outbreak in Brooklyn",
    "Brooklyn experiencing influenza cases",
    "Traffic congestion on FDR Drive",
    "severe covid and flu with fever cough fatigue at the hospital",
    "mild headache and nausea today",
    "hi",
    "   ",
    "unsanitary conditions and contamination at the restaurant",
    "feeling sick and ill with chills, getting worse",
]


def _run_spark(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = analyze_health_relevance(df).select(
        "doc_id", "diseases", "symptoms", "n_diseases", "n_symptoms",
        "has_hazard", "is_relevant", "severity", "confidence", "reason",
    )
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_worked_examples_match_reference_rules(spark):
    rows = list(enumerate(WORKED_EXAMPLES))
    got = _run_spark(spark, rows)
    for i, text in rows:
        want = reference_analyze(text)
        have = {k: got[i][k] for k in want}
        assert have == want, f"text={text!r}\n spark={have}\n ref={want}"


def test_specific_fixture_values(spark):
    """Pin exact numbers so formula drift is caught even if both
    implementations drift together."""
    got = _run_spark(spark, [(0, "Flu outbreak in Brooklyn")])[0]
    # 'tb' ⊂ 'ouTBreak' — the reference's substring quirk, reproduced
    # faithfully (relevance_consumer.py matches `kw in text_lower`)
    assert got["diseases"] == "Influenza,Tuberculosis"
    assert got["has_hazard"] is True           # 'outbreak'
    assert got["is_relevant"] is True
    assert got["severity"] == "unknown"
    assert got["confidence"] == 0.8            # 0.6 + 0.1*min(2,2)

    got = _run_spark(
        spark, [(0, "severe covid and flu with fever cough fatigue at the hospital")]
    )[0]
    assert got["n_diseases"] == 2              # COVID-19, Influenza
    assert got["n_symptoms"] == 3              # fever, cough, fatigue
    assert got["severity"] == "severe"
    # 0.6 + 0.1*2 + 0.05*3 + 0.05 = 1.0 -> capped
    assert got["confidence"] == 0.9

    got = _run_spark(spark, [(0, "hi")])[0]
    assert got["is_relevant"] is False
    assert got["confidence"] == 0.0
    assert got["reason"] == "insufficient_text"


def test_corpus_agrees_with_reference_port(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    got = _run_spark(spark, rows)
    for doc_id, text in rows:
        want = reference_analyze(text)
        have = {k: got[doc_id][k] for k in want}
        assert have == want, f"doc {doc_id}: {have} != {want}"
