"""Datamart runner: executes Model SQL in ref-topological order.

The reference's dbt layer is a full-refresh CREATE TABLE AS per model in
DAG order (every model is materialized='table'; dependency edges come from
ref()/source(), SURVEY §3 entry point 2). Here: inputs are registered as
temp views, each model's Spark SQL runs in topo order, and its result is
registered as a view for downstream ref()s. Catalyst handles
analyze/optimize per statement — including scalar subqueries and partition
pruning that BigQuery did remotely.

Materialization note for scale: views keep the whole datamart lazy, which
would recompute shared upstreams (all_financials feeds ~10 models). The
runner therefore materializes a model eagerly (localCheckpoint or a
warehouse write via `store`) when ≥2 downstream models ref() it — the same
cost model dbt's table materialization encodes.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession

from aave_etl_spark.datamart.models import MODELS, Model
from aave_etl_spark.io.table_store import TableStore


def topo_order(models: dict[str, Model] | None = None) -> list[str]:
    """Kahn's algorithm over ref() edges; deterministic (insertion order)."""
    ms = models or MODELS
    pending = dict(ms)
    done: list[str] = []
    resolved: set[str] = set()
    while pending:
        ready = [n for n, m in pending.items() if all(r in resolved for r in m.refs)]
        if not ready:
            raise ValueError(f"ref cycle or missing ref among: {sorted(pending)}")
        for n in ready:
            done.append(n)
            resolved.add(n)
            del pending[n]
    return done


def run_datamart(
    spark: SparkSession,
    inputs: dict[str, DataFrame],
    models: dict[str, Model] | None = None,
    store: TableStore | None = None,
) -> dict[str, DataFrame]:
    """Run the datamart DAG over the given input tables.

    inputs: source-view name → DataFrame (lake + warehouse tables).
    Returns model name → result DataFrame; every model also stays
    registered as a temp view. Missing sources raise up front with the
    full list, mirroring dbt compile errors."""
    ms = models or MODELS
    order = topo_order(ms)

    needed = {s for m in ms.values() for s in m.sources}
    missing = sorted(needed - set(inputs))
    if missing:
        raise ValueError(f"missing source tables: {missing}")

    for name, df in inputs.items():
        df.createOrReplaceTempView(name)

    ref_counts = Counter(r for m in ms.values() for r in m.refs)
    out: dict[str, DataFrame] = {}
    for name in order:
        df = spark.sql(ms[name].sql)
        if store is not None:
            store.write(df, name)
            df = store.read(name)
        elif ref_counts[name] >= 2:
            # shared upstream: cut the lineage so each consumer doesn't
            # recompute it (dbt table-materialization cost model)
            df = df.localCheckpoint(eager=False)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
