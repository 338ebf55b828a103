"""Explicit StructTypes for every lake table (FIXTURES.md; SURVEY §1.4).

The reference pins schemas only by convention (column lists in asset bodies
+ ``standardise_types`` dtype coercion, helpers.py:663-693) and golden
tests. We make them explicit so connectors declare their output shape and
empty short-circuits stay typed. Types follow the reference's conventions:
amounts decimal-adjusted double, addresses lowercase string, timestamps
UTC, nullable everywhere (BigQuery NULL parity).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _schema(*cols: tuple[str, object]) -> StructType:
    return StructType([StructField(name, dtype(), True) for name, dtype in cols])


S = StringType
L = LongType
D = DoubleType
T = TimestampType
B = BooleanType

# S1 — DeFiLlama closest-block lookup (data_lake.py:125-131; FIXTURES §1)
BLOCK_NUMBERS_BY_DAY = _schema(
    ("block_day", T), ("block_time", T), ("block_height", L),
    ("end_block", L), ("chain", S), ("market", S),
)

# S2/S3 — market token lists (helpers.py:90-165, 1381-1516; FIXTURES §2)
MARKET_TOKENS_BY_DAY = _schema(
    ("reserve", S), ("name", S), ("symbol", S), ("decimals", L),
    ("atoken", S), ("atoken_symbol", S), ("pool", S), ("market", S),
    ("atoken_decimals", L), ("block_height", L), ("block_day", T),
)

# S4 — oracle price scan (data_lake.py:337-338; FIXTURES §3)
ORACLE_PRICES_BY_DAY = _schema(
    ("reserve", S), ("symbol", S), ("market", S),
    ("block_height", L), ("block_day", T), ("usd_price", D),
)

# S5/S6 — token transfers, Covalent CSV / Alchemy JSON (helpers.py:215-256,
# 439-468; FIXTURES §4)
TOKEN_TRANSFERS_BY_DAY = _schema(
    ("transfers_transfer_type", S), ("transfers_from_address", S),
    ("transfers_to_address", S), ("transfers_contract_address", S),
    ("transfers_contract_name", S), ("transfers_contract_decimals", L),
    ("transfers_contract_symbol", S), ("block_day", T),
    ("amount_transferred", D), ("start_block", L), ("end_block", L),
    ("market", S), ("collector", S),
)

# S7 — ERC20 balanceOf / scaledBalanceOf scan (data_lake.py:616-625; FIXTURES §5)
COLLECTOR_ATOKEN_BALANCES_BY_DAY = _schema(
    ("collector", S), ("market", S), ("token", S), ("symbol", S),
    ("block_height", L), ("block_day", T), ("balance", D), ("scaled_balance", D),
)

NON_ATOKEN_BALANCES_BY_DAY = _schema(
    ("contract_address", S), ("chain", S), ("market", S), ("token", S),
    ("decimals", L), ("symbol", S), ("block_height", L), ("block_day", T),
    ("balance", D),
)

# S8 — event logs by topic hash (helpers.py:603-661). topics_1 carries the
# first indexed argument (needed by the MintedToTreasury decode,
# data_lake.py:978-984); NULL when the event has no indexed args.
EVENTS_BY_TOPIC = _schema(
    ("block_signed_at", T), ("block_height", L), ("tx_hash", S),
    ("raw_log_topics_0", S), ("raw_log_topics_1", S), ("sender_address", S),
    ("raw_log_data", S),
)

# S9 — reserve config+state multicall (helpers.py:937-965; FIXTURES §9)
PROTOCOL_DATA_BY_DAY = _schema(
    ("block_day", T), ("block_height", L), ("market", S), ("reserve", S),
    ("symbol", S), ("decimals", L),
    ("ltv", D), ("liquidation_threshold", D), ("liquidation_bonus", D),
    ("reserve_factor", D),
    ("usage_as_collateral_enabled", B), ("borrowing_enabled", B),
    ("stable_borrow_rate_enabled", B), ("is_active", B), ("is_frozen", B),
    ("is_paused", B), ("siloed_borrowing", B),
    ("reserve_emode_category", L),
    ("borrow_cap", L), ("supply_cap", L), ("unbacked_mint_cap", L),
    ("debt_ceiling", L), ("liquidation_protocol_fee", D),
    ("unbacked_atokens", D), ("scaled_accrued_to_treasury", D),
    ("atoken_supply", D), ("stable_debt", D), ("variable_debt", D),
    ("available_liquidity", D),
    ("liquidity_rate", D), ("variable_borrow_rate", D),
    ("stable_borrow_rate", D), ("average_stable_rate", D),
    ("liquidity_index", D), ("variable_borrow_index", D),
    ("last_update_timestamp", T),
)

# S10 — UiIncentiveDataProvider scan, flattened (protocol_data_lake.py:533-573;
# FIXTURES §10)
RAW_INCENTIVES_BY_DAY = _schema(
    ("block_day", T), ("block_height", L), ("market", S),
    ("underlying_asset", S), ("token_address", S),
    ("incentive_controller_address", S), ("reward_token_symbol", S),
    ("reward_token_address", S), ("reward_oracle_address", S),
    ("emission_per_second", D), ("incentives_last_update_timestamp", L),
    ("token_incentives_index", D), ("emission_end_timestamp", L),
    ("reward_price_feed", D), ("reward_token_decimals", L),
    ("precision", L), ("price_feed_decimals", L), ("token_type", S),
)

# S11 — eMode category scan (protocol_data_lake.py:596-708)
EMODE_CONFIG_BY_DAY = _schema(
    ("block_day", T), ("block_height", L), ("market", S),
    ("reserve_emode_category", L), ("emode_ltv", D),
    ("emode_liquidation_threshold", D), ("emode_liquidation_bonus", D),
    ("emode_price_address", S), ("emode_category_name", S),
)

# S12 — re-homed Flipside scans (data_lake.py:1276-1400, 1589-1732; FIXTURES §13)
USER_LM_REWARDS_CLAIMED = _schema(
    ("block_day", T), ("chain", S), ("market", S), ("reward_vault", S),
    ("incentives_controller", S), ("amount", D),
)

STREAMING_PAYMENTS_STATE = _schema(
    ("deposit_day", T), ("contract_address", S), ("recipient", S),
    ("sender", S), ("token_address", S), ("stream_id", L),
    ("start_time_s", L), ("stop_time_s", L),
    ("start_time", T), ("stop_time", T), ("stream_rate", D),
    ("symbol", S), ("decimals", L),
    ("deposit", D), ("claims", D), ("vested", D), ("unvested", D),
    ("unclaimed", D),
)

# S13 — CSV seed tables (data_lake.py:1409-1579, 1869-1905; FIXTURES §12)
TX_CLASSIFICATION = _schema(("measure", S), ("measure_type", S), ("currency", S))
DISPLAY_NAMES = _schema(
    ("collector", S), ("chain", S), ("market", S),
    ("display_chain", S), ("display_name", S),
)
# the reference's internal_external_addresses seed (data_lake.py:1409-1446),
# consumed downstream under its warehouse input name aave_internal_addresses
INTERNAL_ADDRESSES = _schema(
    ("chain", S), ("label", S), ("contract_address", S), ("internal_external", S),
)
STREAMS_METADATA = _schema(
    ("vendor_label", S), ("stream_label", S), ("proposal_id", L),
    ("stream_contract", S), ("token", S), ("stream_id", L), ("symbol", S),
    ("term", S), ("upfront_native", D), ("bonus_usd", D),
)

# S14 — CoinGecko daily prices (protocol_data_lake.py:1300-1306)
COINGECKO_DATA_BY_DAY = _schema(
    ("block_day", T), ("price_usd", D), ("symbol", S), ("cg_id", S),
    ("address", S), ("chain", S), ("decimals", L),
)

# S15 — beaconcha.in staking returns (protocol_data_lake.py:1383-1398)
BEACON_STAKING_RETURNS_BY_DAY = _schema(
    ("partition_date", S), ("beaconchain_day", L), ("day_start", T),
    ("day_end", T), ("apr", D), ("cl_apr", D), ("el_apr", D),
)

# S16 — Compound v2/v3 rates (protocol_data_lake.py:1496-1518)
COMPOUND_BY_DAY = _schema(
    ("block_day", T), ("block_height", L), ("chain", S),
    ("compound_version", S), ("symbol", S), ("address", S),
    ("underlying_symbol", S), ("underlying_address", S),
    ("supply_apy", D), ("borrow_apy", D), ("deposits", D), ("borrows", D),
)

# S9h — hourly reserve-data twin (protocol_hourly_data_lake.py:136-240):
# same parser as PROTOCOL_DATA_BY_DAY keyed by the hour's block
PROTOCOL_DATA_BY_HOUR = _schema(
    ("block_hour", T), ("block_height", L), ("market", S), ("reserve", S),
    ("symbol", S), ("decimals", L),
    ("ltv", D), ("liquidation_threshold", D), ("liquidation_bonus", D),
    ("reserve_factor", D),
    ("usage_as_collateral_enabled", B), ("borrowing_enabled", B),
    ("stable_borrow_rate_enabled", B), ("is_active", B), ("is_frozen", B),
    ("is_paused", B), ("siloed_borrowing", B),
    ("reserve_emode_category", L),
    ("borrow_cap", L), ("supply_cap", L), ("unbacked_mint_cap", L),
    ("debt_ceiling", L), ("liquidation_protocol_fee", D),
    ("unbacked_atokens", D), ("scaled_accrued_to_treasury", D),
    ("atoken_supply", D), ("stable_debt", D), ("variable_debt", D),
    ("available_liquidity", D),
    ("liquidity_rate", D), ("variable_borrow_rate", D),
    ("stable_borrow_rate", D), ("average_stable_rate", D),
    ("liquidity_index", D), ("variable_borrow_index", D),
    ("last_update_timestamp", T),
)

# S21 — hourly block lookup (protocol_hourly_data_lake.py:80-133): single
# closest-block call per (hour, market); no end_block (unlike S1 daily)
BLOCK_NUMBERS_BY_HOUR = _schema(
    ("block_hour", T), ("block_time", T), ("block_height", L),
    ("chain", S), ("market", S),
)

# S22 — Compound v2/v3 hourly rates (protocol_hourly_data_lake.py:246-481)
COMPOUND_BY_HOUR = _schema(
    ("block_hour", T), ("block_height", L), ("chain", S),
    ("compound_version", S), ("symbol", S), ("address", S),
    ("underlying_symbol", S), ("underlying_address", S),
    ("supply_apy", D), ("borrow_apy", D), ("deposits", D), ("borrows", D),
)

# S17 — liquidity-depth sweep (protocol_data_lake.py:855-1065; FIXTURES §15)
LIQUIDITY_DEPTH_RAW = _schema(
    ("market_key", S), ("market", S), ("chain", S), ("loop_market", S),
    ("to_asset", S), ("to_asset_address", S), ("to_asset_decimals", L),
    ("from_asset", S), ("from_asset_address", S), ("from_asset_decimals", L),
    ("from_asset_price", D), ("to_asset_price", D), ("chain_id", L),
    ("from_amount_usd", D), ("from_amount_native", D),
    ("to_amount_native", D), ("to_amount_usd", D), ("price_impact", D),
    ("fetch_time", T),
)

# S18 — token holders (protocol_data_lake.py:1800-1815)
SM_TOKEN_HOLDERS_BY_DAY = _schema(
    ("block_day", T), ("chain", S), ("safety_module_token", S),
    ("stk_token_address", S), ("holder_address", S), ("balance", D),
    ("total_supply", D), ("block_height", L),
)

# S19 — Balancer BPT (protocol_data_lake.py:1105-1118)
BALANCER_BPT_BY_DAY = _schema(
    ("pool", S), ("symbol", S), ("name", S), ("decimals", L), ("denom", S),
    ("price_token", S), ("price_symbol", S), ("rate", D),
    ("actual_supply", D), ("block_day", T), ("block_height", L), ("chain", S),
)

# S20 — misc balance scans (data_lake.py:1961-1971; protocol_data_lake.py:1184-1235,
# 1881-1882)
ETH_BALANCES_BY_DAY = _schema(
    ("block_height", L), ("block_day", T), ("chain", S), ("market", S),
    ("collector", S), ("wrapped_gas_token", S), ("gas_token", S), ("balance", D),
)
SAFETY_MODULE_RPC = _schema(
    ("emission_per_second", D), ("emission_per_day", D),
    ("last_update_timestamp", T), ("stk_token_supply", D),
    ("unstaked_token_supply", D), ("block_day", T), ("block_height", L),
    ("stk_token_address", S), ("stk_token_symbol", S),
    ("unstaked_token_address", S), ("unstaked_token_symbol", S),
    ("reward_token_address", S), ("reward_token_symbol", S),
)
# LSD token totalSupply scan (protocol_data_lake.py:723-830)
MATIC_LSD_SUPPLY_BY_DAY = _schema(
    ("block_day", T), ("block_height", L), ("chain", S), ("address", S),
    ("symbol", S), ("decimals", L), ("total_supply", D),
)
# Balancer pool token weights/balances (protocol_data_lake.py:1673-1759)
SM_BAL_POOL_CONTENTS = _schema(
    ("block_day", T), ("block_height", L), ("chain", S),
    ("safety_module_token", S), ("bal_pool_address", S), ("token_address", S),
    ("symbol", S), ("weight", D), ("balance", D),
)
ERC20_BALANCES_BY_DAY = _schema(
    ("block_day", T), ("block_height", L), ("chain", S),
    ("wallet_address", S), ("token", S), ("token_address", S), ("balance", D),
)

V3_ACCRUED_FEES_BY_DAY = _schema(
    ("market", S), ("reserve", S), ("symbol", S), ("atoken", S),
    ("atoken_symbol", S), ("block_height", L), ("block_day", T),
    ("accrued_fees_scaled", D), ("liquidity_index", D), ("accrued_fees", D),
)

V3_MINTED_TO_TREASURY_BY_DAY = _schema(
    ("market", S), ("reserve", S), ("symbol", S), ("atoken", S),
    ("atoken_symbol", S), ("block_height", L), ("block_day", T),
    ("minted_to_treasury_amount", D), ("minted_amount", D),
)

# treasury LM rewards accrued to the collector (data_lake.py:1095-1279)
TREASURY_ACCRUED_INCENTIVES_BY_DAY = _schema(
    ("chain", S), ("market", S), ("collector_contract", S),
    ("block_height", L), ("block_day", T), ("rewards_token_address", S),
    ("rewards_token_symbol", S), ("accrued_rewards", D),
)

PARASWAP_CLAIMABLE_FEES = _schema(
    ("block_day", T), ("chain", S), ("market", S), ("paraswap_fee_claimer", S),
    ("reserve", S), ("symbol", S), ("claimable", D),
)
