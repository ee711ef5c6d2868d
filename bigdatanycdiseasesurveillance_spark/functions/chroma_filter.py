"""ChromaDB filter-dict -> Catalyst Column compiler (SURVEY §2.12 M5).

The reference queries its vector store with Chroma's composable filter
dicts — `where` over metadata and `where_document` over content
(reference: src/database/chromadb_client.py:194-306). The engine's
vector search is a DataFrame scan, so the natural port is a tiny
compiler from the filter language to a boolean Column that fuses into
the similarity scan (and pushes down to parquet like any predicate).

Metadata (`where`) operators: $eq (also bare value), $ne, $gt, $gte,
$lt, $lte, $in, $nin, with $and / $or composition and Chroma's implicit
AND across multiple top-level keys.

Document (`where_document`) operators: $contains, $not_contains, with
$and / $or composition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_COMPARATORS = {
    "$eq": lambda c, v: c == F.lit(v),
    "$ne": lambda c, v: c != F.lit(v),
    "$gt": lambda c, v: c > F.lit(v),
    "$gte": lambda c, v: c >= F.lit(v),
    "$lt": lambda c, v: c < F.lit(v),
    "$lte": lambda c, v: c <= F.lit(v),
    "$in": lambda c, v: c.isin(*v),
    "$nin": lambda c, v: ~c.isin(*v),
}


def _all(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _any(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def where_to_column(where: dict) -> Column:
    """Compile a Chroma `where` metadata filter dict to a Column."""
    if not isinstance(where, dict) or not where:
        raise ValueError(f"where must be a non-empty dict, got {where!r}")
    conds: list[Column] = []
    for key, val in where.items():
        if key == "$and":
            conds.append(_all([where_to_column(w) for w in val]))
        elif key == "$or":
            conds.append(_any([where_to_column(w) for w in val]))
        elif key.startswith("$"):
            raise ValueError(f"unknown logical operator {key!r}")
        elif isinstance(val, dict):
            if len(val) != 1:
                raise ValueError(f"field filter must have one operator: {val!r}")
            op, operand = next(iter(val.items()))
            if op not in _COMPARATORS:
                raise ValueError(f"unknown comparator {op!r}")
            conds.append(_COMPARATORS[op](F.col(key), operand))
        else:  # bare value -> $eq (Chroma shorthand)
            conds.append(F.col(key) == F.lit(val))
    return _all(conds)  # implicit AND across top-level keys


def where_document_to_column(wd: dict, text_col: str = "text") -> Column:
    """Compile a Chroma `where_document` content filter dict."""
    if not isinstance(wd, dict) or not wd:
        raise ValueError(f"where_document must be a non-empty dict, got {wd!r}")
    conds: list[Column] = []
    for key, val in wd.items():
        if key == "$and":
            conds.append(_all([where_document_to_column(w, text_col) for w in val]))
        elif key == "$or":
            conds.append(_any([where_document_to_column(w, text_col) for w in val]))
        elif key == "$contains":
            conds.append(F.col(text_col).contains(val))
        elif key == "$not_contains":
            conds.append(~F.col(text_col).contains(val))
        else:
            raise ValueError(f"unknown where_document operator {key!r}")
    return _all(conds)
