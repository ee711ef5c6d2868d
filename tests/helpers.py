"""Oracle-parity comparison mirroring the driver's gate: sort columns by
name, normalize values, compare as order-insensitive row multisets."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pandas as pd

from bigdatanycdiseasesurveillance_spark.tables import TABLE_NAMES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{round(v, 6):.6f}"
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        if pd.isna(v):
            return "NULL"
        return pd.Timestamp(v).isoformat()
    if isinstance(v, dt.date):
        # dates and midnight timestamps normalize identically (DuckDB
        # DATE arrives as datetime64, Spark DATE as datetime.date)
        return pd.Timestamp(v).isoformat()
    if hasattr(v, "item"):  # numpy scalars
        return _norm_value(v.item())
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def normalize(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_value(row[c]) for c in cols)
        for _, row in pdf[cols].iterrows()
    ]
    return sorted(rows)


def assert_parity(spark_df, sql: str, con: duckdb.DuckDBPyConnection, name: str = "?"):
    got = normalize(spark_df.toPandas())
    want = normalize(con.sql(sql).df())
    assert len(got) == len(want), (
        f"{name}: row count mismatch spark={len(got)} duckdb={len(want)}"
    )
    mismatches = [
        (g, w) for g, w in zip(got, want) if g != w
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first: "
        f"spark={mismatches[0][0]} duckdb={mismatches[0][1]}"
    )
