"""Per-chain daily block boundary table (reference
aave_data/assets/financials/data_warehouse.py:44-82 `blocks_by_day`).

The reference takes the per-market block-lookup output and reduces it to a
per-chain table (the market config's block_table_master decides which
market writes it); the transform itself is a 5-column projection +
drop_duplicates. Distinct on a 5-col projection is one shuffle keyed by the
projected row — at 100 TB the dedup key cardinality is chain x day, so the
exchange is tiny after map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from aave_etl_spark.functions.standardise import standardise_types


def blocks_by_day(block_numbers_by_day: DataFrame) -> DataFrame:
    """Closest block to the daily 0000 UTC partition boundary, per chain.

    Reference data_warehouse.py:61 — column projection then
    drop_duplicates; types through the standardise chokepoint."""
    out = block_numbers_by_day.select(
        "block_day", "block_time", "block_height", "end_block", "chain"
    ).dropDuplicates()
    return standardise_types(out)
