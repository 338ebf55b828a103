"""Per-market daily state/config warehouse transforms (reference
aave_data/assets/protocol/protocol_data_warehouse.py:33-160).

- ``market_state_by_day``: projection of the per-day protocol lake table
  plus the four UI APY columns — compound-per-second rate→APY
  ``(1 + rate/31536000)^31536000 - 1`` exactly as the AAVE UI displays it
  (protocol_data_warehouse.py:119-123, rate_to_apy).
- ``market_config_by_day``: risk-parameter projection left-joined to the
  day's eMode category config on (block_day, block_height, market,
  reserve_emode_category), dropping the eMode price address
  (protocol_data_warehouse.py:54-95).

Both are narrow transforms: one projection, row-wise math, and one join
whose right side is the per-day eMode table (markets × categories — tiny,
broadcast by AQE). At 100 TB the lake input arrives partition-pruned per
day from the store; nothing here shuffles the fact side except the
broadcast-hash probe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aave_etl_spark.functions.scalars import SECONDS_PER_YEAR, apy_from_rate

SECONDS_IN_YEAR = SECONDS_PER_YEAR

STATE_COLS = (
    "block_day",
    "block_height",
    "market",
    "reserve",
    "symbol",
    "unbacked_atokens",
    "scaled_accrued_to_treasury",
    "atoken_supply",
    "stable_debt",
    "variable_debt",
    "liquidity_rate",
    "variable_borrow_rate",
    "stable_borrow_rate",
    "average_stable_rate",
    "liquidity_index",
    "variable_borrow_index",
    "available_liquidity",
)

CONFIG_COLS = (
    "block_day",
    "block_height",
    "market",
    "reserve",
    "symbol",
    "decimals",
    "ltv",
    "liquidation_threshold",
    "liquidation_bonus",
    "reserve_factor",
    "usage_as_collateral_enabled",
    "borrowing_enabled",
    "stable_borrow_rate_enabled",
    "is_active",
    "is_frozen",
    "reserve_emode_category",
    "borrow_cap",
    "supply_cap",
    "is_paused",
    "siloed_borrowing",
    "liquidation_protocol_fee",
    "unbacked_mint_cap",
    "debt_ceiling",
)

_EMODE_KEYS = ["block_day", "block_height", "market", "reserve_emode_category"]


def rate_to_apy(rate: Column) -> Column:
    """Per-second compounding APY as the AAVE UI displays it
    (protocol_data_warehouse.py:119-123; docs.aave.com borrow-interest-rate).
    Thin alias of the shared ``functions.scalars.apy_from_rate`` so the
    formula lives in exactly one place."""
    return apy_from_rate(rate)


def market_state_by_day(protocol_data_by_day: DataFrame) -> DataFrame:
    """State data for each token in each market on each day, with APYs
    (protocol_data_warehouse.py:98-160)."""
    return protocol_data_by_day.select(
        *[
            F.col(c).alias("atoken_symbol") if c == "symbol" else F.col(c)
            for c in STATE_COLS
        ],
        rate_to_apy(F.col("liquidity_rate")).alias("deposit_apy"),
        rate_to_apy(F.col("variable_borrow_rate")).alias("variable_borrow_apy"),
        rate_to_apy(F.col("stable_borrow_rate")).alias("stable_borrow_apy"),
        rate_to_apy(F.col("average_stable_rate")).alias("av_stable_borrow_apy"),
    )


def market_config_by_day(
    protocol_data_by_day: DataFrame, emode_config_by_day: DataFrame
) -> DataFrame:
    """Config parameters for each token in each market on each day, enriched
    with the matching eMode category's risk parameters
    (protocol_data_warehouse.py:33-95). Tokens in no eMode category (or a
    category missing from the day's eMode table) carry NULL emode fields."""
    cfg = protocol_data_by_day.select(*CONFIG_COLS)
    emode = emode_config_by_day.drop("emode_price_address")
    emode_extras = [c for c in emode.columns if c not in _EMODE_KEYS]
    joined = cfg.join(F.broadcast(emode), on=_EMODE_KEYS, how="left")
    # Spark puts join keys first; restore the reference's pandas-merge column
    # order (left frame order, then the eMode extras).
    return joined.select(*CONFIG_COLS, *emode_extras).withColumnRenamed(
        "symbol", "atoken_symbol"
    )
