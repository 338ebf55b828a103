"""Driver-gated check of REAL datamart model SQL (not a re-shaped twin).

Reference-shaped inputs are derived deterministically from the synthetic
`nation` table with engine-portable SQL (identical text runs in Spark and
DuckDB), then:

- Spark side: inputs registered as views → `plans.run_datamart` executes
  the actual `safety_module_totals_by_day` → `sm_cost_of_cover_by_token_by_day`
  model chain (datamart/models.py, ports of the reference dbt SQL);
- oracle side: the SAME derivation CTEs + the SAME model SQL strings are
  composed into one DuckDB query.

So the driver's hash compare certifies the model SQL itself — dialect
portability included — not a hand-written equivalent. Output is row-wise
arithmetic (no cross-row float sums), so the compare is exact.
"""

from __future__ import annotations

from aave_etl_spark.datamart.models import MODELS
from aave_etl_spark.queries.registry import register, t

_DAYS = "(VALUES (TIMESTAMP '2024-01-01'), (TIMESTAMP '2024-01-02'), (TIMESTAMP '2024-01-03')) AS d(block_day)"

_DERIVE_SM_RPC = f"""
SELECT
  CAST(n.n_nationkey AS DOUBLE) * 0.001 AS emission_per_second,
  CAST(n.n_nationkey AS DOUBLE) * 100 + 50 AS emission_per_day,
  CAST(0 AS BIGINT) AS last_update_timestamp,
  1000 + CAST(n.n_nationkey AS DOUBLE) * 10 AS stk_token_supply,
  CAST(10000 AS DOUBLE) AS unstaked_token_supply,
  d.block_day,
  CAST(1 AS BIGINT) AS block_height,
  concat('0xstk_', lower(n.n_name)) AS stk_token_address,
  concat('stk', n.n_name) AS stk_token_symbol,
  concat('0xun_', lower(n.n_name)) AS unstaked_token_address,
  n.n_name AS unstaked_token_symbol,
  '0xaave' AS reward_token_address,
  'AAVE' AS reward_token_symbol
FROM nation n CROSS JOIN {_DAYS}
"""

# three price-source populations exercise the reference's 3-way coalesce
# (stk oracle price → unstaked oracle price → coingecko)
_DERIVE_PRICES = f"""
SELECT d.block_day, 'ethereum' AS chain, '0xaave' AS reserve, 'AAVE' AS symbol,
       CAST(90 AS DOUBLE) AS usd_price, 'aave_oracle' AS pricing_source
FROM {_DAYS}
UNION ALL
SELECT d.block_day, 'ethereum', concat('0xstk_', lower(n.n_name)), concat('stk', n.n_name),
       CAST(100 + n.n_nationkey AS DOUBLE), 'aave_oracle'
FROM nation n CROSS JOIN {_DAYS} WHERE n.n_nationkey % 3 = 0
UNION ALL
SELECT d.block_day, 'ethereum', concat('0xun_', lower(n.n_name)), n.n_name,
       CAST(50 + n.n_nationkey AS DOUBLE), 'aave_oracle'
FROM nation n CROSS JOIN {_DAYS} WHERE n.n_nationkey % 3 = 1
"""

_DERIVE_CG = f"""
SELECT d.block_day, CAST(25 + n.n_nationkey AS DOUBLE) AS price_usd,
       concat('stk', n.n_name) AS symbol, 'cg' AS cg_id,
       concat('0xstk_', lower(n.n_name)) AS address, 'ethereum' AS chain,
       CAST(18 AS BIGINT) AS decimals
FROM nation n CROSS JOIN {_DAYS} WHERE n.n_nationkey % 3 = 2
"""


def _oracle() -> str:
    totals_sql = MODELS["safety_module_totals_by_day"].sql
    final_sql = MODELS["sm_cost_of_cover_by_token_by_day"].sql
    return f"""
WITH safety_module_rpc AS ({_DERIVE_SM_RPC}),
token_prices_by_day AS ({_DERIVE_PRICES}),
coingecko_data_by_day AS ({_DERIVE_CG}),
safety_module_totals_by_day AS ({totals_sql})
{final_sql}
"""


@register(
    "datamart_sm_cost_of_cover_real",
    oracle=_oracle(),
    doc=(
        "REAL datamart SQL under the driver gate: safety_module_totals_by_day →"
        " sm_cost_of_cover_by_token_by_day executed by plans.run_datamart on one"
        " side and verbatim by DuckDB on the other (3-way price-fallback"
        " coalesce exercised across three input populations)"
    ),
)
def datamart_sm_cost_of_cover_real(spark, sf_dir):
    from aave_etl_spark.plans import run_datamart

    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    inputs = {
        "safety_module_rpc": spark.sql(_DERIVE_SM_RPC),
        "token_prices_by_day": spark.sql(_DERIVE_PRICES),
        "coingecko_data_by_day": spark.sql(_DERIVE_CG),
    }
    subset = {
        k: MODELS[k]
        for k in ("safety_module_totals_by_day", "sm_cost_of_cover_by_token_by_day")
    }
    return run_datamart(spark, inputs, models=subset)["sm_cost_of_cover_by_token_by_day"]


# ---------------------------------------------------------------------------
# Second real-model chain: chains_markets + market_{state,config}_by_day
# passthroughs → reserve_factor_income_by_day (4 models, join-enrichment
# family). Derivations from `supplier`; all arithmetic row-wise.
# ---------------------------------------------------------------------------
_DAYS2 = "(VALUES (TIMESTAMP '2024-02-01'), (TIMESTAMP '2024-02-02')) AS d(block_day)"

_DERIVE_STATE = f"""
SELECT
  d.block_day, CAST(1 AS BIGINT) AS block_height, 'ethereum_v2' AS market,
  concat('0xr_', CAST(s.s_suppkey AS STRING)) AS reserve,
  concat('a', s.s_name) AS atoken_symbol,
  CAST(0 AS DOUBLE) AS unbacked_atokens, CAST(0 AS DOUBLE) AS scaled_accrued_to_treasury,
  1000 + CAST(s.s_suppkey AS DOUBLE) AS atoken_supply,
  CAST(s.s_suppkey % 11 AS DOUBLE) * 10 AS stable_debt,
  CAST(s.s_suppkey % 13 AS DOUBLE) * 20 AS variable_debt,
  CAST(s.s_suppkey % 5 AS DOUBLE) / 100 AS liquidity_rate,
  CAST(s.s_suppkey % 7 AS DOUBLE) / 100 AS variable_borrow_rate,
  CAST(s.s_suppkey % 9 AS DOUBLE) / 100 AS stable_borrow_rate,
  CAST(0 AS DOUBLE) AS average_stable_rate,
  CAST(1.01 AS DOUBLE) AS liquidity_index, CAST(1.02 AS DOUBLE) AS variable_borrow_index,
  1000 + CAST(s.s_suppkey AS DOUBLE) AS available_liquidity
FROM supplier s CROSS JOIN {_DAYS2}
"""

_DERIVE_CONFIG = f"""
SELECT
  d.block_day, CAST(1 AS BIGINT) AS block_height, 'ethereum_v2' AS market,
  concat('0xr_', CAST(s.s_suppkey AS STRING)) AS reserve,
  concat('a', s.s_name) AS atoken_symbol,
  CAST(18 AS BIGINT) AS decimals,
  CAST(0.8 AS DOUBLE) AS ltv, CAST(0.85 AS DOUBLE) AS liquidation_threshold,
  CAST(1.05 AS DOUBLE) AS liquidation_bonus,
  CAST(10 + s.s_suppkey % 20 AS DOUBLE) / 100 AS reserve_factor
FROM supplier s CROSS JOIN {_DAYS2}
"""

_DERIVE_NAMES = """
SELECT * FROM (VALUES ('0xc', 'ethereum', 'ethereum_v2', 'Ethereum', 'Ethereum V2'))
  AS v(collector, chain, market, display_chain, display_name)
"""

_DERIVE_PRICES2 = f"""
SELECT d.block_day, 'ethereum' AS chain,
       concat('0xr_', CAST(s.s_suppkey AS STRING)) AS reserve,
       concat('a', s.s_name) AS symbol,
       1 + CAST(s.s_suppkey % 50 AS DOUBLE) AS usd_price,
       'aave_oracle' AS pricing_source
FROM supplier s CROSS JOIN {_DAYS2}
"""


def _oracle_rf() -> str:
    return f"""
WITH warehouse_market_state_by_day AS ({_DERIVE_STATE}),
warehouse_market_config_by_day AS ({_DERIVE_CONFIG}),
display_names AS ({_DERIVE_NAMES}),
token_prices_by_day AS ({_DERIVE_PRICES2}),
chains_markets AS ({MODELS["chains_markets"].sql}),
market_state_by_day AS ({MODELS["market_state_by_day"].sql}),
market_config_by_day AS ({MODELS["market_config_by_day"].sql})
{MODELS["reserve_factor_income_by_day"].sql}
"""


@register(
    "datamart_reserve_factor_income_real",
    oracle=_oracle_rf(),
    doc=(
        "REAL datamart SQL under the driver gate (2nd chain): chains_markets +"
        " market_{state,config}_by_day passthroughs → reserve_factor_income_by_day,"
        " executed by plans.run_datamart vs the verbatim SQL in DuckDB"
    ),
)
def datamart_reserve_factor_income_real(spark, sf_dir):
    from aave_etl_spark.plans import run_datamart

    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    inputs = {
        "warehouse_market_state_by_day": spark.sql(_DERIVE_STATE),
        "warehouse_market_config_by_day": spark.sql(_DERIVE_CONFIG),
        "display_names": spark.sql(_DERIVE_NAMES),
        "token_prices_by_day": spark.sql(_DERIVE_PRICES2),
    }
    subset = {
        k: MODELS[k]
        for k in (
            "chains_markets",
            "market_state_by_day",
            "market_config_by_day",
            "reserve_factor_income_by_day",
        )
    }
    return run_datamart(spark, inputs, models=subset)["reserve_factor_income_by_day"]


# ---------------------------------------------------------------------------
# Third real-model chain: chains_markets + all_treasury_balances +
# treasury_totals, fed by a derived all_financials-shaped long table (the
# flagship model's UNPIVOT output). Exercises the usd/native self-join,
# the legacy-fee stack, the replace() measure rename, display-day shift
# and the 3-way rollup UNION — all with the verbatim model SQL on both
# engines.
# ---------------------------------------------------------------------------
_DAYS3 = "(VALUES (TIMESTAMP '2024-03-01'), (TIMESTAMP '2024-03-02')) AS d(block_day)"

_DERIVE_AF = f"""
SELECT
  d.block_day, 'ethereum' AS chain, 'Ethereum' AS display_chain,
  'ethereum_v2' AS market, 'Ethereum V2' AS display_name,
  '0xcol' AS collector, 'Treasury' AS collector_label,
  concat('0xt_', lower(n.n_name)) AS token,
  concat('a', n.n_name) AS symbol,
  concat('0xr_', lower(n.n_name)) AS underlying_reserve,
  CASE WHEN n.n_nationkey % 5 = 0 THEN 'AAVE' ELSE n.n_name END AS underlying_reserve_symbol,
  m.measure, 'balance' AS measure_type,
  CASE WHEN n.n_nationkey % 4 = 0 THEN 'USDC' ELSE 'Other Token' END AS balance_group,
  CASE WHEN n.n_nationkey % 4 = 0 THEN 'stablecoin' ELSE 'unstablecoin' END AS stable_class,
  CAST(100 + n.n_nationkey AS DOUBLE) * (CASE WHEN m.currency = 'usd' THEN 2.0 ELSE 1.0 END) AS value,
  m.currency
FROM nation n
CROSS JOIN {_DAYS3}
CROSS JOIN (VALUES ('end_balance_usd', 'usd'), ('end_accrued_fees_usd', 'usd'),
                   ('end_balance', 'native'), ('end_accrued_fees', 'native'))
  AS m(measure, currency)
"""

_DERIVE_NAMES3 = """
SELECT * FROM (VALUES ('0xcol', 'ethereum', 'ethereum_v2', 'Ethereum', 'Ethereum V2'))
  AS v(collector, chain, market, display_chain, display_name)
"""

_DERIVE_LEGACY = f"""
SELECT d.block_day, 'ethereum' AS chain, 'ethereum_v2' AS market,
       '0xclaimer' AS paraswap_fee_claimer, '0xlegacy' AS paraswap_legacy_claimer,
       '0xr_legacy' AS reserve, 'LGC' AS symbol, CAST(4 AS DOUBLE) AS claimable
FROM {_DAYS3}
"""

_DERIVE_BGL = """
SELECT * FROM (VALUES ('ethereum_v2', '0xr_legacy', 'LGC', '0xr_legacy', 'LGC',
                       'ethereum', 'Other Token', 'unstablecoin'))
  AS v(market, atoken, atoken_symbol, reserve, symbol, chain, balance_group, stable_class)
"""

_DERIVE_TP3 = f"""
SELECT d.block_day, 'ethereum' AS chain, '0xr_legacy' AS reserve, 'LGC' AS symbol,
       CAST(3 AS DOUBLE) AS usd_price, 'aave_oracle' AS pricing_source
FROM {_DAYS3}
"""


def _oracle_tt() -> str:
    return f"""
WITH all_financials AS ({_DERIVE_AF}),
display_names AS ({_DERIVE_NAMES3}),
paraswap_legacy_claimable_fees AS ({_DERIVE_LEGACY}),
balance_group_lookup AS ({_DERIVE_BGL}),
token_prices_by_day AS ({_DERIVE_TP3}),
chains_markets AS ({MODELS["chains_markets"].sql}),
all_treasury_balances AS ({MODELS["all_treasury_balances"].sql})
{MODELS["treasury_totals"].sql}
"""


@register(
    "datamart_treasury_totals_real",
    oracle=_oracle_tt(),
    doc=(
        "REAL datamart SQL under the driver gate (3rd chain): all_treasury_balances"
        " (usd/native self-join + legacy-fee stack) → treasury_totals 3-way rollup,"
        " verbatim model SQL on both engines"
    ),
)
def datamart_treasury_totals_real(spark, sf_dir):
    from dataclasses import replace as dc_replace

    from aave_etl_spark.plans import run_datamart

    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    spark.sql(_DERIVE_AF).createOrReplaceTempView("all_financials")
    inputs = {
        "display_names": spark.sql(_DERIVE_NAMES3),
        "paraswap_legacy_claimable_fees": spark.sql(_DERIVE_LEGACY),
        "balance_group_lookup": spark.sql(_DERIVE_BGL),
        "token_prices_by_day": spark.sql(_DERIVE_TP3),
    }
    # all_financials is pre-registered as a view, so strip it from the
    # ref list (the runner would otherwise demand it as a model)
    subset = {
        "chains_markets": MODELS["chains_markets"],
        "all_treasury_balances": dc_replace(
            MODELS["all_treasury_balances"], refs=("chains_markets",)
        ),
        "treasury_totals": MODELS["treasury_totals"],
    }
    return run_datamart(spark, inputs, models=subset)["treasury_totals"]
