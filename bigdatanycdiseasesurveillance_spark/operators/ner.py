"""NER location extraction (SURVEY §2.11 M6) — the model-gated path.

The reference runs spaCy en_core_web_sm per record on the driver,
keeping GPE/LOC/FAC entities (reference:
src/spark_consumers/location_consumer.py:133-156). Engine form: a
mapInPandas stage with a per-worker spaCy singleton. spaCy is not in
this container, so the operator degrades to the dictionary alias
matcher (the hermetic default the location cascade already uses) and
reports which path ran — the Spark plumbing (schema, batching,
truncation) is identical either way and is what the tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the dictionary fallback reuses the alias vocabulary of the location
# cascade so both paths emit comparable entities
from ..domain.location import ALIASES, NEIGHBORHOODS

MAX_NER_CHARS = 5000  # reference caps NER input (location_consumer.py:147)


def extract_locations(
    docs: DataFrame, text_col: str = "text", out_col: str = "extracted_locations"
) -> DataFrame:
    """Append array<string> of location mentions. spaCy when importable
    (per-worker singleton, GPE/LOC/FAC ents), else deterministic
    dictionary matching over the alias + neighborhood vocabulary."""
    fields = docs.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.StringType())),
        T.StructField("ner_backend", T.StringType()),
    ]
    out_schema = T.StructType(fields)
    cols = docs.columns
    vocab = sorted(
        {a for a, _ in ALIASES} | {n[0].lower() for n in NEIGHBORHOODS}
    )

    def run_batches(batch_iter):  # closure: executors lack repo on sys.path
        nlp = None
        try:
            import spacy  # type: ignore

            nlp = spacy.load("en_core_web_sm")
        except Exception:
            nlp = None

        def dict_match(text: str) -> list[str]:
            lc = (text or "").lower()[:MAX_NER_CHARS]
            return [v for v in vocab if v in lc]

        for pdf in batch_iter:
            texts = pdf[text_col].fillna("").str.slice(0, MAX_NER_CHARS)
            if nlp is not None:
                ents = [
                    [e.text for e in nlp(t).ents if e.label_ in ("GPE", "LOC", "FAC")]
                    for t in texts
                ]
                backend = "spacy"
            else:
                ents = [dict_match(t) for t in texts]
                backend = "dictionary"
            pdf = pdf[cols].copy()
            pdf[out_col] = ents
            pdf["ner_backend"] = backend
            yield pdf

    from ..tables import parallelize_scan

    # NER is Python-per-doc — never let a single-split scan serialize it
    return parallelize_scan(docs).mapInPandas(run_batches, out_schema)
