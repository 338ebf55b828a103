"""Balancer BPT warehouse transform (reference:
aave_data/assets/protocol/protocol_data_warehouse.py:427-472).

Joins the lake BPT rate/supply scan (S19, sources/connectors.py
balancer_bpt_by_day) with warehouse token prices to price the BPT token
and the pool TVL. The price dim side is tiny (per-day reserve prices) —
broadcast; the price key is (chain, block_day, price_token=reserve,
price_symbol=symbol) and a missing price means the denom is already USD,
so it fills to 1 (:459-461).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def balancer_bpt_by_day(
    balancer_bpt_data_by_day: DataFrame,
    token_prices_by_day: DataFrame,
) -> DataFrame:
    """One row per (chain, pool, day) with the BPT priced in USD.

    underlying_asset_price = the price of the pool's pricing token
    (coalesce to 1 — USD-denominated pools have no price row);
    bpt_usd_price = rate × underlying price; pool_tvl_usd = bpt_usd_price
    × actual_supply (protocol_data_warehouse.py:452-468)."""
    prices = token_prices_by_day.select(
        "chain",
        "block_day",
        F.col("reserve").alias("price_token"),
        F.col("symbol").alias("price_symbol"),
        "usd_price",
    )
    bpt = balancer_bpt_data_by_day.join(
        F.broadcast(prices), ["chain", "block_day", "price_token", "price_symbol"], "left"
    )
    return (
        bpt.withColumn(
            "underlying_asset_price", F.coalesce(F.col("usd_price"), F.lit(1.0))
        )
        .withColumn("bpt_usd_price", F.col("rate") * F.col("underlying_asset_price"))
        .withColumn("pool_tvl_usd", F.col("bpt_usd_price") * F.col("actual_supply"))
        .drop("usd_price")
    )
