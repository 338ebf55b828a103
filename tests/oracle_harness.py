"""Local mirror of the driver's correctness gate: run a registered query on
Spark and its oracle on DuckDB over the same parquet tables, compare
row-count, column set, and order-insensitive canonicalized values
(floats at 6 significant digits ≈ tolerance-based hash)."""

from __future__ import annotations

import datetime
import math

import pandas as pd

from aave_etl_spark.io.catalog import TABLES


def register_duckdb_views(con, sf_dir: str) -> None:
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == 0:
            return "0"
        return f"{v:.6g}"
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, (datetime.datetime,)):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    return sorted(out)


def compare_query(spark, duck, query, sf_dir: str) -> None:
    """Assert Spark result ≡ oracle result (count, columns, values)."""
    spark_pdf = query.builder(spark, sf_dir).toPandas()
    register_duckdb_views(duck, sf_dir)
    duck_pdf = duck.execute(query.oracle).df()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{query.name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{query.name}: row count spark={len(spark_pdf)} oracle={len(duck_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows != d_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
        ][:5]
        raise AssertionError(f"{query.name}: value mismatch, first diffs: {diffs}")
