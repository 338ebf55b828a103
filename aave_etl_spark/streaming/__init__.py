"""Structured Streaming layer.

The reference has no true streaming operators (SURVEY §2.10): its hourly
tables are cron micro-batches, and its only stream-like construct is the
append-only snapshot keyed by fetch_time with latest-only reads. This
module provides the Spark-native continuous form of exactly those
semantics — optional for reference parity, load-bearing for the 100 TB
ingest path.
"""

from aave_etl_spark.streaming.micro_batch import (
    dedup_snapshot_stream,
    sessionized_stream,
    stateful_running_totals,
    stream_lake_table,
)

__all__ = [
    "dedup_snapshot_stream",
    "sessionized_stream",
    "stateful_running_totals",
    "stream_lake_table",
]
