"""Datamart layer: the reference's ~50 dbt/BigQuery SQL models
(aave_dbt/models/datamart/*.sql) as Spark SQL over temp views.

Each model is a `Model(name, sql, refs, sources)`; `plans.runner` executes
them in ref-topological order, registering each output as a view so
downstream models `ref()` it — exactly dbt's materialized='table' full
rebuild, with Catalyst doing analyze/optimize instead of BigQuery.
"""

from aave_etl_spark.datamart.models import MODELS, Model

__all__ = ["MODELS", "Model"]
