"""A complete lake → warehouse → datamart asset graph over the synthetic
``events`` table, run entirely through the orchestration layer.

This is the driver-certifiable twin of the reference's daily cadence chain
(aave_data/__init__.py:374-407): a partitioned lake asset (per-day slice,
dynamic partition overwrite), an unpartitioned warehouse rollup, and an
unpartitioned datamart model whose LAG window proves cross-partition reads
(day N's ratio needs day N-1's lake slice). The registry query
``orchestration_backfill_run`` (queries/warehouse_ops.py) backfills a date
range through this graph and returns the datamart table read back from the
store — certifying the whole orchestration + TableStore path against a
plain-SQL DuckDB oracle.

Scale: the lake asset's per-partition filter is a partition-pruned scan at
100 TB (events would be date-partitioned at rest); each backfill day writes
one ``day=`` directory; the warehouse/datamart full-refresh reads only the
backfilled slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aave_etl_spark.plans.orchestration import DAILY, UNPARTITIONED, Asset, AssetContext, AssetGraph


def _lake_user_day(ctx: AssetContext) -> DataFrame:
    """Lake: per (day, user) event rollup for exactly this partition's day —
    the shape of the reference's per-day lake fetchers (data_lake.py:73-140),
    with the injected ``events`` DataFrame standing in for the transport."""
    ev = ctx.resources["events"]
    day = F.to_date("ts")
    return (
        ev.where(day == F.lit(ctx.partition.date).cast("date"))
        .groupBy(day.alias("day"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )


def _warehouse_day_totals(ctx: AssetContext) -> DataFrame:
    """Warehouse: full-refresh day totals over every lake slice written so
    far (dbt table materialization; protocol_data_warehouse.py:42-105 shape)."""
    lake = ctx.upstream("lake_user_day")
    return lake.groupBy("day").agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("total_value").alias("total_value"),
    )


def _datamart_day_summary(ctx: AssetContext) -> DataFrame:
    """Datamart: day-over-day ratio via LAG — deliberately cross-partition
    (day N reads day N-1), the all_financials LEAD-pairing dependency shape
    (aave_dbt/models/datamart/all_financials.sql). Single-partition window is
    fine: input is one row per day."""
    wh = ctx.upstream("warehouse_day_totals")
    w = Window.orderBy("day")
    return wh.withColumn(
        "day_over_day", F.col("total_value") / F.lag("total_value").over(w)
    )


def events_pipeline_graph() -> AssetGraph:
    return AssetGraph(
        [
            Asset(
                name="lake_user_day",
                fn=_lake_user_day,
                group="data_lake",
                partitioning=DAILY,
                partition_cols=("day",),
            ),
            Asset(
                name="warehouse_day_totals",
                fn=_warehouse_day_totals,
                deps=("lake_user_day",),
                group="warehouse_datamart",
                partitioning=UNPARTITIONED,
            ),
            Asset(
                name="datamart_day_summary",
                fn=_datamart_day_summary,
                deps=("warehouse_day_totals",),
                group="warehouse_datamart",
                partitioning=UNPARTITIONED,
            ),
        ]
    )
