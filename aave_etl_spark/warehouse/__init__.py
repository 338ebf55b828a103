"""Warehouse layer: the reference's pandas join/aggregate transforms
(aave_data/assets/financials/data_warehouse.py, protocol/...) re-expressed
as Spark DataFrame ops. Full-table transforms in the reference; here each
is a pure function DataFrame(s) → DataFrame so the runner composes them.
"""

from aave_etl_spark.warehouse.measures import (
    atoken_measures_by_day,
    non_atoken_measures_by_day,
)
from aave_etl_spark.warehouse.prices import token_prices_by_day
from aave_etl_spark.warehouse.incentives import (
    incentives_by_day,
    treasury_incentives_by_day,
)
from aave_etl_spark.warehouse.blocks import blocks_by_day
from aave_etl_spark.warehouse.liquidity import (
    liquidity_depth,
    paraswap_fees_dedup,
    paraswap_legacy_claimable_fees,
)

__all__ = [
    "atoken_measures_by_day",
    "non_atoken_measures_by_day",
    "token_prices_by_day",
    "incentives_by_day",
    "treasury_incentives_by_day",
    "blocks_by_day",
    "liquidity_depth",
    "paraswap_fees_dedup",
    "paraswap_legacy_claimable_fees",
]
