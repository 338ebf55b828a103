"""Execution planning: dependency-ordered datamart runs (replaces the
reference's Dagster + dbt orchestration, SURVEY §3 entry point 2)."""

from aave_etl_spark.plans.runner import run_datamart, topo_order

__all__ = ["run_datamart", "topo_order"]
