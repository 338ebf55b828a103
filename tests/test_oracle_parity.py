"""Every registered query with an oracle must match DuckDB on sf0.001 —
the local mirror of the driver's t2 gate (which runs at sf0.01)."""

from __future__ import annotations

import pytest

from aave_etl_spark.queries import all_queries
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare_query

QUERIES = all_queries()
WITH_ORACLE = [name for name, q in QUERIES.items() if q.oracle is not None]
ROWS_ONLY = [name for name, q in QUERIES.items() if q.oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    compare_query(spark, duck, QUERIES[name], SF_SMOKE)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name].builder(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # driver contract: every queries() key with an oracle has matching SQL
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25
