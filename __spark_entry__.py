"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (the all_financials chain shape,
  SURVEY.md §7.2 step 2) over /root/testdata/sf0.001.
- ``queries()``: one entry per implemented operator from SURVEY.md §2 —
  see `aave_etl_spark/queries/` for the inventory; each query's docstring
  cites the §2 rows it covers.
- ``oracle_sql()``: DuckDB-dialect equivalents with identical column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aave_etl_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = all_queries()["all_financials_shape"]
    return q.builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.builder for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
