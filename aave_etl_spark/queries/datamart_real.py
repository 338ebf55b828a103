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

import re

from aave_etl_spark.datamart.models import MODELS
from aave_etl_spark.queries.registry import register, t


def _head_select(
    head: str,
    table: str,
    t0: str = "block_day",
    s: tuple[str, ...] = (),
    v: tuple[str, ...] = (),
    ns: int = 0,
    nv: int = 0,
) -> str:
    """One branch of a union-aligned multi-head projection.

    Several verbatim model outputs share a registry slot by projecting onto
    a common (head, t0, s1..sN, v1..vM) superset schema — pure renames and
    typed-NULL pads, so the driver compare stays ROW-LEVEL exact per model.
    The same text runs on Spark (over run_datamart temp views) and DuckDB
    (over model CTEs)."""
    if len(s) > ns or len(v) > nv:
        # a miscounted head must fail loudly — silent truncation would pass
        # parity (identical on both engines) while un-certifying the
        # dropped model columns
        raise ValueError(
            f"_head_select({head!r}): {len(s)} key / {len(v)} value columns "
            f"exceed the aligned superset ns={ns} / nv={nv}"
        )
    cols = [f"'{head}' AS head", f"{t0} AS t0"]
    for i in range(ns):
        cols.append(f"{s[i] if i < len(s) else 'CAST(NULL AS STRING)'} AS s{i + 1}")
    for i in range(nv):
        cols.append(f"{v[i] if i < len(v) else 'CAST(NULL AS DOUBLE)'} AS v{i + 1}")
    return "SELECT " + ", ".join(cols) + f" FROM {table}"


def _duck_dialect(sql: str) -> str:
    """Mechanical Spark→DuckDB rewrites for the two constructs the engines
    place differently (everything else runs verbatim, SURVEY §4):

    - ``last_value(x) ignore nulls over``  → ``last_value(x ignore nulls) over``
      (Spark puts IGNORE NULLS outside the call parens, DuckDB inside;
      mutually exclusive syntaxes)
    - ``add_months(d, -n)``               → ``(d - INTERVAL n MONTH)``
      (no plain-SQL add_months in DuckDB)
    """
    out = re.sub(
        r"last_value\(((?:[^()]|\([^()]*\))*)\)\s+ignore\s+nulls\s+over",
        r"last_value(\1 ignore nulls) over",
        sql,
        flags=re.IGNORECASE,
    )
    out = re.sub(
        r"add_months\(\s*(DATE\s+'[^']+')\s*,\s*-(\d+)\s*\)",
        r"(\1 - INTERVAL \2 MONTH)",
        out,
        flags=re.IGNORECASE,
    )

    # ``inline(array(struct('x' as a, 1 as b), ...))`` → ``VALUES`` table
    # (Spark's generator has no DuckDB twin; only the literal-struct form
    # the models use is handled)
    def _inline_to_values(m: re.Match) -> str:
        body = m.group(1)
        rows, fields = [], None
        for sm in re.finditer(r"struct\(([^)]*)\)", body):
            pairs = re.findall(r"('[^']*'|-?\d+(?:\.\d+)?)\s+as\s+(\w+)", sm.group(1))
            fields = [f for _, f in pairs]
            rows.append("(" + ", ".join(v for v, _ in pairs) + ")")
        return (
            "SELECT * FROM (VALUES "
            + ", ".join(rows)
            + ") AS _v("
            + ", ".join(fields)
            + ")"
        )

    out = re.sub(
        r"select\s+inline\(array\((.*?\))\s*\)\s*\)",
        _inline_to_values,
        out,
        flags=re.IGNORECASE | re.DOTALL,
    )
    # the rewrites are pattern-scoped: a model varying the construct's form
    # must fail at import, not surface as an opaque DuckDB error later
    low = out.lower()
    for bad in (") ignore nulls over", "add_months(", "inline(array("):
        if bad in low:
            raise ValueError(f"_duck_dialect: unrewritten construct {bad!r} survives")
    return out

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

_DERIVE_PROTOCOL_DATA = f"""
SELECT
  d.block_day, CAST(1 AS BIGINT) AS block_height, 'ethereum_v2' AS market,
  concat('0xr_', CAST(s.s_suppkey AS STRING)) AS reserve,
  concat('a', s.s_name) AS symbol,
  CAST(0 AS DOUBLE) AS unbacked_atokens, CAST(0 AS DOUBLE) AS scaled_accrued_to_treasury,
  1000 + CAST(s.s_suppkey AS DOUBLE) AS atoken_supply,
  CAST(s.s_suppkey % 11 AS DOUBLE) * 10 AS stable_debt,
  CAST(s.s_suppkey % 13 AS DOUBLE) * 20 AS variable_debt,
  CAST(s.s_suppkey % 5 AS DOUBLE) / 100 AS liquidity_rate,
  CAST(s.s_suppkey % 7 AS DOUBLE) / 100 AS variable_borrow_rate,
  CAST(s.s_suppkey % 9 AS DOUBLE) / 100 AS stable_borrow_rate,
  CAST(0 AS DOUBLE) AS average_stable_rate,
  CAST(1.01 AS DOUBLE) AS liquidity_index, CAST(1.02 AS DOUBLE) AS variable_borrow_index,
  1000 + CAST(s.s_suppkey AS DOUBLE) AS available_liquidity,
  CAST(18 AS BIGINT) AS decimals,
  CAST(0.8 AS DOUBLE) AS ltv, CAST(0.85 AS DOUBLE) AS liquidation_threshold,
  CAST(1.05 AS DOUBLE) AS liquidation_bonus,
  CAST(10 + s.s_suppkey % 20 AS DOUBLE) / 100 AS reserve_factor,
  s.s_suppkey % 2 = 0 AS usage_as_collateral_enabled,
  s.s_suppkey % 3 != 1 AS borrowing_enabled,
  s.s_suppkey % 5 = 0 AS stable_borrow_rate_enabled,
  TRUE AS is_active,
  s.s_suppkey % 7 = 0 AS is_frozen,
  CAST(s.s_suppkey % 3 AS BIGINT) AS reserve_emode_category,
  CAST(1000 + s.s_suppkey % 50 AS DOUBLE) AS borrow_cap,
  CAST(2000 + s.s_suppkey % 50 AS DOUBLE) AS supply_cap,
  FALSE AS is_paused,
  s.s_suppkey % 11 = 0 AS siloed_borrowing,
  CAST(0.1 AS DOUBLE) AS liquidation_protocol_fee,
  CAST(0 AS DOUBLE) AS unbacked_mint_cap,
  CAST(s.s_suppkey AS DOUBLE) * 100 AS debt_ceiling
FROM supplier s CROSS JOIN {_DAYS2}
"""

# eMode lake fixture for the daily warehouse transform: categories 0/1
# configured on both days (category 2 absent -> NULL emode after the left
# join, exercising the no-category arm exactly like the old inline fixture)
_DERIVE_EMODE = f"""
SELECT d.block_day, CAST(1 AS BIGINT) AS block_height, 'ethereum_v2' AS market,
       c.reserve_emode_category, c.emode_category_name,
       CAST(0.91 AS DOUBLE) AS emode_ltv,
       CAST(1.03 AS DOUBLE) AS emode_liquidation_bonus,
       CAST(0.94 AS DOUBLE) AS emode_liquidation_threshold,
       '0xemode_price' AS emode_price_address
FROM (VALUES (CAST(0 AS BIGINT), 'stable-e'), (CAST(1 AS BIGINT), 'eth-e'))
     AS c(reserve_emode_category, emode_category_name)
CROSS JOIN {_DAYS2}
"""

# DuckDB twins of the REAL warehouse transforms (warehouse/market.py —
# reference protocol_data_warehouse.py:33-160). The Spark side runs the
# DataFrame transforms; the oracle runs this SQL over the same lake CTEs,
# so parity certifies the transform (projection + rate_to_apy pow + eMode
# left join + emode_price_address drop), not a fixture of its output.
_WH_STATE_SQL = """
SELECT block_day, block_height, market, reserve, symbol AS atoken_symbol,
  unbacked_atokens, scaled_accrued_to_treasury, atoken_supply, stable_debt,
  variable_debt, liquidity_rate, variable_borrow_rate, stable_borrow_rate,
  average_stable_rate, liquidity_index, variable_borrow_index,
  available_liquidity,
  pow(1 + liquidity_rate / (60*60*24*365), 60*60*24*365) - 1 AS deposit_apy,
  pow(1 + variable_borrow_rate / (60*60*24*365), 60*60*24*365) - 1 AS variable_borrow_apy,
  pow(1 + stable_borrow_rate / (60*60*24*365), 60*60*24*365) - 1 AS stable_borrow_apy,
  pow(1 + average_stable_rate / (60*60*24*365), 60*60*24*365) - 1 AS av_stable_borrow_apy
FROM protocol_data_by_day
"""

_WH_CONFIG_SQL = """
SELECT p.block_day, p.block_height, p.market, p.reserve,
  p.symbol AS atoken_symbol, p.decimals, p.ltv, p.liquidation_threshold,
  p.liquidation_bonus, p.reserve_factor, p.usage_as_collateral_enabled,
  p.borrowing_enabled, p.stable_borrow_rate_enabled, p.is_active, p.is_frozen,
  p.reserve_emode_category, p.borrow_cap, p.supply_cap, p.is_paused,
  p.siloed_borrowing, p.liquidation_protocol_fee, p.unbacked_mint_cap,
  p.debt_ceiling, e.emode_category_name, e.emode_ltv,
  e.emode_liquidation_bonus, e.emode_liquidation_threshold
FROM protocol_data_by_day p
LEFT JOIN emode_config_by_day e
  ON p.block_day = e.block_day AND p.block_height = e.block_height
 AND p.market = e.market AND p.reserve_emode_category = e.reserve_emode_category
"""


def _wh_inputs(spark):
    """The two warehouse views built by the REAL transforms from the lake
    fixtures (Spark side of the oracle twins above)."""
    from aave_etl_spark.warehouse.market import market_config_by_day, market_state_by_day

    pdd = spark.sql(_DERIVE_PROTOCOL_DATA)
    emode = spark.sql(_DERIVE_EMODE)
    return {
        "warehouse_market_state_by_day": market_state_by_day(pdd),
        "warehouse_market_config_by_day": market_config_by_day(pdd, emode),
    }


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
WITH protocol_data_by_day AS ({_DERIVE_PROTOCOL_DATA}),
emode_config_by_day AS ({_DERIVE_EMODE}),
warehouse_market_state_by_day AS ({_WH_STATE_SQL}),
warehouse_market_config_by_day AS ({_WH_CONFIG_SQL}),
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
        **_wh_inputs(spark),
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
  m.measure,
  CASE WHEN m.measure LIKE 'protocol_fees%' THEN 'income' ELSE 'balance' END AS measure_type,
  CASE WHEN n.n_nationkey % 4 = 0 THEN 'USDC' ELSE 'Other Token' END AS balance_group,
  CASE WHEN n.n_nationkey % 4 = 0 THEN 'stablecoin' ELSE 'unstablecoin' END AS stable_class,
  CAST(100 + n.n_nationkey AS DOUBLE) * (CASE WHEN m.currency = 'usd' THEN 2.0 ELSE 1.0 END) AS value,
  m.currency
FROM nation n
CROSS JOIN {_DAYS3}
CROSS JOIN (VALUES ('end_balance_usd', 'usd'), ('end_accrued_fees_usd', 'usd'),
                   ('end_balance', 'native'), ('end_accrued_fees', 'native'),
                   ('protocol_fees_received_usd', 'usd'), ('protocol_fees_received', 'native'))
  AS m(measure, currency)
"""

_DERIVE_NAMES3 = """
SELECT * FROM (VALUES ('0xcol', 'ethereum', 'ethereum_v2', 'Ethereum', 'Ethereum V2'))
  AS v(collector, chain, market, display_chain, display_name)
"""

# lake twin incl. a dominated duplicate the warehouse dedup must drop
_DERIVE_LEGACY = f"""
SELECT d.block_day, 'ethereum' AS chain, 'ethereum_v2' AS market,
       '0xclaimer' AS paraswap_fee_claimer, '0xlegacy' AS paraswap_legacy_claimer,
       '0xr_legacy' AS reserve, 'LGC' AS symbol, CAST(4 AS DOUBLE) AS claimable
FROM {_DAYS3}
UNION ALL
SELECT d.block_day, 'ethereum' AS chain, 'aaa_v2' AS market,
       '0xclaimer' AS paraswap_fee_claimer, '0xlegacy' AS paraswap_legacy_claimer,
       '0xr_legacy' AS reserve, 'LGC' AS symbol, CAST(777 AS DOUBLE) AS claimable
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


# (treasury_totals itself is certified as the first head of the
# consolidated datamart_treasury_rollups_real query further below.)


# ---------------------------------------------------------------------------
# Fourth real-model chain — THE FLAGSHIP. aave_atokens (latest-day scalar
# subquery) → all_financials (reference all_financials.sql, 449 lines):
# 3-way measure UNION, reserve mapping, LEAD start/end pairing, the
# 4-branch liq-adjust UNION straddling the 2023-05-06 cutoff, 37-column
# UNPIVOT (null rows dropped on both engines), 4-way dim join and the
# silent measure_type-not-null drop (SURVEY §7.4.6). All 12 inputs are
# derived from `nation` with engine-portable SQL; binary-exact literal
# steps (0.125/0.25/…) keep every float op identical on both engines.
# ---------------------------------------------------------------------------
_AF_DAYS = (
    "(VALUES (TIMESTAMP '2023-05-05'), (TIMESTAMP '2023-05-06'),"
    " (TIMESTAMP '2023-05-07'), (TIMESTAMP '2023-05-08')) AS d(block_day)"
)
# day index as double (5..8): varies balances/prices so LEAD pairs differ
_AF_DD = "CAST(extract(day FROM d.block_day) AS DOUBLE)"

# base: nation → (market, chain, collector); ethereum_v2 gets the literal
# ecosystem-reserve collector so both treasury_spend CASE branches fire
_AF_BASE = """
SELECT b.*,
  CASE WHEN b.market = 'ethereum_v2'
       THEN '0x25f2226b597e8f9514b3f68f00f494cf4f286491'
       ELSE concat('0xcol_', b.market) END AS collector
FROM (
  SELECT n.n_nationkey AS k, lower(n.n_name) AS nm,
    CASE n.n_nationkey % 3 WHEN 0 THEN 'polygon_v3' WHEN 1 THEN 'ethereum_v2' ELSE 'fantom_v3' END AS market,
    CASE n.n_nationkey % 3 WHEN 0 THEN 'polygon' WHEN 1 THEN 'ethereum' ELSE 'fantom' END AS chain
  FROM nation n
) b
"""

_AF_ATM = f"""
SELECT b.collector, b.chain, b.market,
  concat('0xt_', b.nm) AS token, concat('a', b.nm) AS symbol, d.block_day,
  CAST(1000 + b.k * 10 AS DOUBLE) + {_AF_DD} * 5 AS balance,
  CASE WHEN b.k % 5 = 0 THEN CAST(0 AS DOUBLE) ELSE CAST(900 + b.k AS DOUBLE) END AS scaled_balance,
  CAST(10 + b.k AS DOUBLE) + {_AF_DD} AS accrued_fees,
  CAST(50 + b.k AS DOUBLE) AS tokens_in_external,
  CAST(5 AS DOUBLE) AS tokens_in_internal,
  CAST(7 + b.k AS DOUBLE) AS tokens_out_external,
  CAST(3 AS DOUBLE) AS tokens_out_internal,
  CAST(2 AS DOUBLE) AS minted_to_treasury_amount,
  CAST(1 AS DOUBLE) AS minted_amount
FROM ({_AF_BASE}) b CROSS JOIN {_AF_DAYS}
"""

_AF_NAM = f"""
SELECT b.collector AS contract_address, b.chain, b.market,
  concat('0xnt_', b.nm) AS token, b.nm AS symbol, d.block_day,
  CAST(500 + b.k AS DOUBLE) + {_AF_DD} * 2 AS balance,
  CAST(20 AS DOUBLE) AS tokens_in_external,
  CAST(2 AS DOUBLE) AS tokens_in_internal,
  CAST(4 AS DOUBLE) AS tokens_out_external,
  CAST(1 AS DOUBLE) AS tokens_out_internal,
  CAST(b.k AS DOUBLE) * 0.5 + {_AF_DD} AS paraswap_fees_claimable
FROM ({_AF_BASE}) b CROSS JOIN {_AF_DAYS}
WHERE b.k % 4 = 0
"""

_AF_ETH = f"""
SELECT m.collector, m.chain, m.market,
  concat('0xgas_', m.chain) AS wrapped_gas_token,
  concat('GAS_', m.chain) AS gas_token,
  d.block_day,
  CAST(100 AS DOUBLE) + {_AF_DD} AS balance
FROM (SELECT DISTINCT market, chain, collector FROM ({_AF_BASE}) bb) m
CROSS JOIN {_AF_DAYS}
"""

# oracle prices cover k%7<5; coingecko covers non-atokens, gas tokens and
# k%7=5 reserves; k%7=6 reserves stay unpriced → NULL usd rows dropped by
# UNPIVOT on both engines (null-exclusion parity)
_AF_ORC = f"""
SELECT concat('0xr_', b.nm) AS reserve, d.block_day, b.market,
  CAST(1 AS DOUBLE) + CAST(b.k AS DOUBLE) * 0.125 + {_AF_DD} * 0.25 AS usd_price
FROM ({_AF_BASE}) b CROSS JOIN {_AF_DAYS}
WHERE b.k % 7 < 5
"""

_AF_CG = f"""
SELECT concat('0xnt_', b.nm) AS address, b.chain, d.block_day,
  CAST(2 AS DOUBLE) + CAST(b.k AS DOUBLE) * 0.0625 + {_AF_DD} * 0.125 AS price_usd
FROM ({_AF_BASE}) b CROSS JOIN {_AF_DAYS} WHERE b.k % 4 = 0
UNION ALL
SELECT concat('0xgas_', c.chain), c.chain, d.block_day,
  CAST(3 AS DOUBLE) + {_AF_DD} * 0.5
FROM (SELECT DISTINCT chain FROM ({_AF_BASE}) bb) c CROSS JOIN {_AF_DAYS}
UNION ALL
SELECT concat('0xr_', b.nm), b.chain, d.block_day,
  CAST(4 AS DOUBLE) + CAST(b.k AS DOUBLE) * 0.25 + {_AF_DD} * 0.0625
FROM ({_AF_BASE}) b CROSS JOIN {_AF_DAYS} WHERE b.k % 7 = 5
"""

_AF_UR = f"""
SELECT b.market, d.block_day, b.collector AS vault_address,
  concat('0xt_', b.nm) AS token_address,
  CAST(1 AS DOUBLE) + CAST(b.k AS DOUBLE) * 0.5 AS sm_stkAAVE_claims,
  CAST(2 AS DOUBLE) AS sm_stkABPT_claims,
  CAST(b.k AS DOUBLE) * 0.25 AS lm_aave_v2_claims
FROM ({_AF_BASE}) b CROSS JOIN {_AF_DAYS}
WHERE b.k % 3 = 1 AND b.k % 2 = 1
"""

# 37 unpivot measures; 'price_change_usd' and 'tokens_out_internal' are
# deliberately left unclassified to exercise the silent inner-join drop
_AF_USD_MEASURES = [
    "start_balance_usd", "end_balance_usd", "start_accrued_fees_usd",
    "end_accrued_fees_usd", "tokens_in_internal_usd",
    "tokens_in_external_adjust_usd", "tokens_out_external_usd",
    "tokens_out_internal_usd", "protocol_fees_received_usd",
    "protocol_fees_accrued_usd", "atoken_interest_usd",
    "sm_stkAAVE_claims_usd", "sm_stkABPT_claims_usd", "lm_aave_v2_claims_usd",
    "start_paraswap_fees_claimable_usd", "end_paraswap_fees_claimable_usd",
    "ecosystem_reserve_spend_usd", "treasury_spend_usd", "price_change_usd",
]
_AF_UNCLASSIFIED = {"price_change_usd", "tokens_out_internal"}


def _af_txc() -> str:
    rows = []
    for m in _AF_USD_MEASURES:
        native = m[: -len("_usd")]
        for measure, currency in ((m, "usd"), (native, "native")):
            if measure in _AF_UNCLASSIFIED or (measure, currency) in {
                ("price_change", "native")
            }:
                continue
            mtype = (
                "balance"
                if ("balance" in measure or "accrued_fees" in measure
                    or "claimable" in measure)
                else "income"
                if ("fees" in measure or "interest" in measure or "price_change" in measure)
                else "expense"
            )
            rows.append(f"('{measure}', '{mtype}', '{currency}')")
    # price_change has no native twin in the unpivot list
    rows = [r for r in rows if r != "('price_change', 'income', 'native')"]
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS v(measure, measure_type, currency)"
    )


_AF_DN = """
SELECT * FROM (VALUES
  ('0x25f2226b597e8f9514b3f68f00f494cf4f286491', 'ethereum', 'ethereum_v2', 'Ethereum', 'Ethereum V2'),
  ('0xcol_polygon_v3', 'polygon', 'polygon_v3', 'Polygon', 'Polygon V3'),
  ('0xcol_fantom_v3', 'fantom', 'fantom_v3', 'Fantom', 'Fantom V3'))
  AS v(collector, chain, market, display_chain, display_name)
"""

_AF_IA = """
SELECT * FROM (VALUES
  ('0x25f2226b597e8f9514b3f68f00f494cf4f286491', 'ethereum', 'Ecosystem Reserve'),
  ('0xcol_polygon_v3', 'polygon', 'Polygon Treasury'),
  ('0xcol_fantom_v3', 'fantom', 'Fantom Treasury'))
  AS v(contract_address, chain, label)
"""

_AF_BGL = f"""
SELECT b.market, concat('0xt_', b.nm) AS atoken, concat('0xr_', b.nm) AS reserve,
  concat('a', b.nm) AS atoken_symbol,
  CASE WHEN b.k % 4 = 0 THEN 'USDC' ELSE 'Other Token' END AS balance_group,
  CASE WHEN b.k % 4 = 0 THEN 'stablecoin' ELSE 'unstablecoin' END AS stable_class
FROM ({_AF_BASE}) b WHERE b.k % 2 = 0
"""

_AF_BND = f"SELECT DISTINCT market, chain FROM ({_AF_BASE}) b"

# two block_days so the latest-day scalar subquery in aave_atokens prunes
_AF_MTB = f"""
SELECT concat('0xt_', b.nm) AS atoken, concat('a', b.nm) AS atoken_symbol,
  CAST(18 AS BIGINT) AS atoken_decimals,
  concat('0xr_', b.nm) AS reserve, b.nm AS symbol, CAST(18 AS BIGINT) AS decimals,
  concat('tok_', b.nm) AS name, b.market, '0xpool' AS pool, d.block_day
FROM ({_AF_BASE}) b
CROSS JOIN (VALUES (TIMESTAMP '2023-05-05'), (TIMESTAMP '2023-05-06')) AS d(block_day)
"""

_AF_INPUTS = {
    "eth_balances_by_day": _AF_ETH,
    "atoken_measures_by_day": _AF_ATM,
    "non_atoken_measures_by_day": _AF_NAM,
    "aave_oracle_prices_by_day": _AF_ORC,
    "coingecko_data_by_day": _AF_CG,
    "user_rewards_by_day": _AF_UR,
    "tx_classification": _af_txc(),
    "display_names": _AF_DN,
    "aave_internal_addresses": _AF_IA,
    "balance_group_lookup": _AF_BGL,
    "block_numbers_by_day": _AF_BND,
    "market_tokens_by_day": _AF_MTB,
}


def _oracle_af() -> str:
    ctes = ",\n".join(f"{name} AS ({sql})" for name, sql in _AF_INPUTS.items())
    return f"""
WITH {ctes},
aave_atokens AS ({MODELS["aave_atokens"].sql}),
af AS ({MODELS["all_financials"].sql})
SELECT * FROM af
"""


@register(
    "datamart_all_financials_real",
    oracle=_oracle_af(),
    doc=(
        "REAL datamart SQL under the driver gate (flagship): aave_atokens →"
        " all_financials (449-line reference model: LEAD pairing, 4-branch"
        " liq-adjust UNION across the 2023-05-06 cutoff, 37-col UNPIVOT,"
        " 4-way dim join + silent measure_type drop) executed by"
        " plans.run_datamart vs the verbatim SQL in DuckDB"
    ),
)
def datamart_all_financials_real(spark, sf_dir):
    from aave_etl_spark.plans import run_datamart

    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    inputs = {name: spark.sql(sql) for name, sql in _AF_INPUTS.items()}
    subset = {k: MODELS[k] for k in ("aave_atokens", "all_financials")}
    return run_datamart(spark, inputs, models=subset)["all_financials"]


# ---------------------------------------------------------------------------
# Fifth chain — END-TO-END verbatim: aave_atokens → all_financials →
# chains_markets → all_treasury_balances (usd/native self-join + legacy-fee
# stack with display-day shift) → treasury_totals / treasury_value_by_asset.
# The real flagship output feeds the real rollups on BOTH engines — six
# models of verbatim SQL under one hash compare.
# ---------------------------------------------------------------------------
_AF2_LEGACY = f"""
SELECT d.block_day, b.chain, b.market,
  '0xclaimer' AS paraswap_fee_claimer, '0xlegacy' AS paraswap_legacy_claimer,
  concat('0xlg_', b.nm) AS reserve, concat('LG', b.nm) AS symbol,
  CAST(4 AS DOUBLE) + CAST(b.k AS DOUBLE) * 0.5 AS claimable
FROM ({_AF_BASE}) b CROSS JOIN {_AF_DAYS}
WHERE b.k % 6 = 2
"""

# legacy reserves priced on days 5-7 only → day-8 rows keep NULL value_usd
# (null-propagation parity through the legacy-fee stack)
_AF2_TP = f"""
SELECT d.block_day, b.chain, concat('0xlg_', b.nm) AS reserve,
  concat('LG', b.nm) AS symbol,
  CAST(2 AS DOUBLE) + CAST(b.k AS DOUBLE) * 0.125 AS usd_price,
  'aave_oracle' AS pricing_source
FROM ({_AF_BASE}) b CROSS JOIN {_AF_DAYS}
WHERE b.k % 6 = 2 AND extract(day FROM d.block_day) < 8
"""

# balance groups: the all_financials rows plus legacy reserves for half the
# legacy claimers (k%12=2) — exercises both the matched branch and the
# coalesce('Other Token','unstablecoin') fallback
_AF2_BGL = f"""
{_AF_BGL}
UNION ALL
SELECT b.market, concat('0xlg_', b.nm) AS atoken, concat('0xlg_', b.nm) AS reserve,
  concat('LG', b.nm) AS atoken_symbol, 'USDC' AS balance_group, 'stablecoin' AS stable_class
FROM ({_AF_BASE}) b WHERE b.k % 12 = 2
"""

# the LAKE paraswap_legacy_fees twin: the kept rows PLUS a dominated
# duplicate per key (market prefixed 'aaa_' sorts below — keep-last keeps
# the original even though the dup's claimable is larger) and a zero-
# claimable key that must vanish entirely. The warehouse transform
# (warehouse/liquidity.py paraswap_legacy_claimable_fees) prunes both;
# its DuckDB twin is _WH_LEGACY_SQL below.
_AF2_LEGACY_LAKE = f"""
{_AF2_LEGACY}
UNION ALL
SELECT d.block_day, b.chain, concat('aaa_', b.market) AS market,
  '0xclaimer' AS paraswap_fee_claimer, '0xlegacy' AS paraswap_legacy_claimer,
  concat('0xlg_', b.nm) AS reserve, concat('LG', b.nm) AS symbol,
  CAST(999 AS DOUBLE) AS claimable
FROM ({_AF_BASE}) b CROSS JOIN {_AF_DAYS} WHERE b.k % 6 = 2
UNION ALL
SELECT d.block_day, b.chain, b.market,
  '0xclaimer' AS paraswap_fee_claimer, '0xlegacy' AS paraswap_legacy_claimer,
  concat('0xzero_', b.nm) AS reserve, concat('Z', b.nm) AS symbol,
  CAST(0 AS DOUBLE) AS claimable
FROM ({_AF_BASE}) b CROSS JOIN {_AF_DAYS} WHERE b.k % 6 = 4
"""

_WH_LEGACY_SQL = """
SELECT block_day, chain, market, paraswap_fee_claimer,
       paraswap_legacy_claimer, reserve, symbol, claimable
FROM (
  SELECT f.*, row_number() OVER (
           PARTITION BY block_day, chain, paraswap_fee_claimer,
                        paraswap_legacy_claimer, reserve
           ORDER BY market DESC, symbol DESC, claimable DESC) AS _rn
  FROM paraswap_legacy_fees f)
WHERE _rn = 1 AND claimable > 0
"""

_AF2_INPUTS = {
    **{k: v for k, v in _AF_INPUTS.items()},
    "balance_group_lookup": _AF2_BGL,
    "paraswap_legacy_fees": _AF2_LEGACY_LAKE,
    "token_prices_by_day": _AF2_TP,
}

_AF2_MODELS = (
    "aave_atokens",
    "all_financials",
    "chains_markets",
    "all_treasury_balances",
    "treasury_totals",
    "treasury_value_by_asset",
)


# both e2e heads (the treasury_totals 3-way rollup and the 8-key
# treasury_value_by_asset rollup) ride the one six-model chain execution,
# union-aligned into a single registry slot — row-level exact per head
_E2E_ALIGN = "\nUNION ALL\n".join(
    [
        _head_select("treasury_totals", "treasury_totals",
                     s=("measure",), v=("value_usd",), ns=7, nv=2),
        _head_select("treasury_value_by_asset", "treasury_value_by_asset",
                     s=("display_chain", "display_market", "collector_label",
                        "token_held_address", "token_held_symbol",
                        "underlying_reserve", "underlying_reserve_symbol"),
                     v=("value_usd", "value_native"), ns=7, nv=2),
    ]
)


def _oracle_e2e() -> str:
    ctes = ",\n".join(f"{name} AS ({sql})" for name, sql in _AF2_INPUTS.items())
    return f"""
WITH {ctes},
paraswap_legacy_claimable_fees AS ({_WH_LEGACY_SQL}),
aave_atokens AS ({MODELS["aave_atokens"].sql}),
all_financials AS ({MODELS["all_financials"].sql}),
chains_markets AS ({MODELS["chains_markets"].sql}),
all_treasury_balances AS ({MODELS["all_treasury_balances"].sql}),
treasury_totals AS ({MODELS["treasury_totals"].sql}),
treasury_value_by_asset AS ({MODELS["treasury_value_by_asset"].sql})
{_E2E_ALIGN}
"""


@register(
    "datamart_treasury_e2e_real",
    oracle=_oracle_e2e(),
    doc=(
        "END-TO-END verbatim chain: real all_financials output feeds"
        " all_treasury_balances (self-join + legacy-fee stack), the"
        " treasury_totals 3-way rollup AND the 8-key treasury_value_by_asset"
        " rollup — six models of verbatim SQL on both engines under one"
        " hash compare (two aligned heads)"
    ),
)
def datamart_treasury_e2e_real(spark, sf_dir):
    from aave_etl_spark.plans import run_datamart

    from aave_etl_spark.warehouse.liquidity import paraswap_legacy_claimable_fees

    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    inputs = {name: spark.sql(sql) for name, sql in _AF2_INPUTS.items()}
    inputs["paraswap_legacy_claimable_fees"] = paraswap_legacy_claimable_fees(
        inputs.pop("paraswap_legacy_fees")
    )
    subset = {k: MODELS[k] for k in _AF2_MODELS}
    run_datamart(spark, inputs, models=subset)
    return spark.sql(_E2E_ALIGN)


# ---------------------------------------------------------------------------
# Sixth chain — the PIVOT family verbatim: aave_atokens →
# streaming_payments_detail (scalar-subquery latest prices, 3-way price
# fallback, epoch-coalesce dates) → streaming_payments_summary (5-agg PIVOT
# over symbol with '<value> <alias>' naming — identical column-name
# derivation on Spark and DuckDB).
# ---------------------------------------------------------------------------
_SP_TOKEN = (
    "CASE WHEN b.k % 2 = 0 THEN concat('0xt_', b.nm) ELSE concat('0xr_', b.nm) END"
)

_SP_META = f"""
SELECT concat('Vendor ', CAST(b.k % 5 AS STRING)) AS vendor_label,
  concat('Stream ', CAST(b.k AS STRING)) AS stream_label,
  CAST(100 + b.k AS BIGINT) AS proposal_id,
  '0xstreamer' AS stream_contract,
  {_SP_TOKEN} AS token,
  CAST(b.k AS BIGINT) AS stream_id,
  CASE b.k % 4 WHEN 0 THEN 'AAVE' WHEN 1 THEN 'aDAI' WHEN 2 THEN 'aUSDC' ELSE 'aUSDT' END AS symbol,
  CASE WHEN b.k % 2 = 0 THEN '12mo' ELSE '6mo' END AS term,
  CAST(b.k AS DOUBLE) * 0.5 AS upfront_native,
  CAST(10 AS DOUBLE) + CAST(b.k AS DOUBLE) AS bonus_usd
FROM ({_AF_BASE}) b
"""

# k%3=2 streams have no on-chain state → the epoch-timestamp coalesce fires
_SP_STATE = f"""
SELECT '0xstreamer' AS contract_address, {_SP_TOKEN} AS token_address,
  CAST(b.k AS BIGINT) AS stream_id,
  TIMESTAMP '2023-04-01' AS deposit_day, TIMESTAMP '2023-04-02' AS start_time,
  TIMESTAMP '2024-04-02' AS stop_time,
  CAST(1000 + b.k AS DOUBLE) AS deposit, CAST(400 + b.k AS DOUBLE) AS vested,
  CAST(600 AS DOUBLE) AS unvested, CAST(300 AS DOUBLE) + CAST(b.k AS DOUBLE) * 0.5 AS claims,
  CAST(100 AS DOUBLE) AS unclaimed
FROM ({_AF_BASE}) b WHERE b.k % 3 != 2
"""

# two days so the latest-day scalar subqueries prune; a polygon row tests
# the chain filter
_SP_TP = f"""
SELECT d.block_day, 'ethereum' AS chain, concat('0xr_', b.nm) AS reserve,
  b.nm AS symbol, CAST(1 AS DOUBLE) + CAST(b.k AS DOUBLE) * 0.25 AS usd_price,
  'aave_oracle' AS pricing_source
FROM ({_AF_BASE}) b
CROSS JOIN (VALUES (TIMESTAMP '2023-05-05'), (TIMESTAMP '2023-05-06')) AS d(block_day)
UNION ALL
SELECT TIMESTAMP '2023-05-06', 'polygon', '0xr_poly', 'poly', CAST(9 AS DOUBLE), 'aave_oracle'
"""

_SP_INPUTS = {
    "streams_metadata": _SP_META,
    "streaming_payments_state": _SP_STATE,
    "token_prices_by_day": _SP_TP,
    "block_numbers_by_day": _AF_BND,
    "market_tokens_by_day": _AF_MTB,
}


def _oracle_sp() -> str:
    ctes = ",\n".join(f"{name} AS ({sql})" for name, sql in _SP_INPUTS.items())
    return f"""
WITH {ctes},
aave_atokens AS ({MODELS["aave_atokens"].sql}),
streaming_payments_detail AS ({MODELS["streaming_payments_detail"].sql}),
sp_summary AS ({MODELS["streaming_payments_summary"].sql})
SELECT * FROM sp_summary
"""


@register(
    "datamart_streaming_summary_real",
    oracle=_oracle_sp(),
    doc=(
        "REAL datamart SQL under the driver gate (PIVOT family): aave_atokens →"
        " streaming_payments_detail → streaming_payments_summary, the 5-agg"
        " PIVOT over symbol executed verbatim on both engines"
    ),
)
def datamart_streaming_summary_real(spark, sf_dir):
    from aave_etl_spark.plans import run_datamart

    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    inputs = {name: spark.sql(sql) for name, sql in _SP_INPUTS.items()}
    subset = {
        k: MODELS[k]
        for k in (
            "aave_atokens",
            "streaming_payments_detail",
            "streaming_payments_summary",
        )
    }
    return run_datamart(spark, inputs, models=subset)["streaming_payments_summary"]


# ---------------------------------------------------------------------------
# Seventh chain — the inv_* LEAD family verbatim: inv_lst_performance_base
# (LST holdings performance: date/market/symbol prefilters, LEAD end-of-day
# pairing on three measures, receipts decomposition, eth-denominated
# ratios). Series are built from a fixed VALUES grid so every LEAD
# partition has exactly one row per day (deterministic pairing).
# ---------------------------------------------------------------------------
_LST_DD = "CAST(extract(day FROM d.block_day) AS DOUBLE)"
_LST_DAYS = (
    "(VALUES (TIMESTAMP '2023-07-10'), (TIMESTAMP '2023-07-11'),"
    " (TIMESTAMP '2023-07-12'), (TIMESTAMP '2023-07-13'),"
    " (TIMESTAMP '2023-07-14')) AS d(block_day)"
)
# day-10 rows exist but fall before the >= '2023-07-11' cutoff; the stETH
# series is dropped by the symbol IN filter; fantom reserves are unpriced
_LST_SERIES = (
    "(VALUES ('ethereum_v2', 'wstETH', '0xr_wsteth', 100.0),"
    " ('ethereum_v2', 'rETH', '0xr_reth', 200.0),"
    " ('fantom_v3', 'wstETH', '0xr_wsteth_f', 300.0),"
    " ('fantom_v3', 'rETH', '0xr_reth_f', 400.0),"
    " ('ethereum_v2', 'stETH', '0xr_steth', 500.0))"
    " AS s(market, symbol, reserve, base)"
)

_LST_NAB = f"""
SELECT d.block_day, s.market, s.reserve AS token, s.symbol,
  CAST(s.base AS DOUBLE) + {_LST_DD} AS balance
FROM {_LST_SERIES} CROSS JOIN {_LST_DAYS}
"""

# liquidity rates: ethereum_v2 wstETH only (rETH hits the coalesce-0 arm);
# harmony_v3 rows are excluded by the NOT IN market filter
_LST_PDD = f"""
SELECT d.block_day, 'ethereum_v2' AS market, 'wstETH' AS symbol,
  '0xr_wsteth' AS reserve, CAST(0.03125 AS DOUBLE) + {_LST_DD} * 0.0078125 AS liquidity_rate
FROM {_LST_DAYS}
UNION ALL
SELECT d.block_day, 'harmony_v3', 'wstETH', '0xr_wsteth_h', CAST(0.5 AS DOUBLE)
FROM {_LST_DAYS}
"""

_LST_ORC = f"""
SELECT d.block_day, 'ethereum_v3' AS market, '0xr_wsteth' AS reserve,
  'wstETH' AS symbol, CAST(2000 AS DOUBLE) + {_LST_DD} * 16 AS usd_price
FROM {_LST_DAYS}
UNION ALL
SELECT d.block_day, 'ethereum_v3', '0xr_reth', 'rETH', CAST(1900 AS DOUBLE) + {_LST_DD} * 8
FROM {_LST_DAYS}
UNION ALL
SELECT d.block_day, 'ethereum_v2', '0xweth', 'WETH', CAST(1600 AS DOUBLE) + {_LST_DD} * 4
FROM {_LST_DAYS}
"""

_LST_BGL = """
SELECT * FROM (VALUES
  ('ethereum_v2', '0xr_wsteth', '0xr_wsteth', 'wstETH', 'Liquid Staking', 'unstablecoin'))
  AS v(market, atoken, reserve, atoken_symbol, balance_group, stable_class)
"""

_LST_INPUTS = {
    "non_atoken_balances_by_day": _LST_NAB,
    "protocol_data_by_day": _LST_PDD,
    "aave_oracle_prices_by_day": _LST_ORC,
    "balance_group_lookup": _LST_BGL,
}


def _oracle_lst() -> str:
    ctes = ",\n".join(f"{name} AS ({sql})" for name, sql in _LST_INPUTS.items())
    return f"""
WITH {ctes},
inv_lst AS ({MODELS["inv_lst_performance_base"].sql})
SELECT * FROM inv_lst
"""


@register(
    "datamart_inv_lst_real",
    oracle=_oracle_lst(),
    doc=(
        "REAL datamart SQL under the driver gate (inv_* LEAD family):"
        " inv_lst_performance_base executed by plans.run_datamart vs the"
        " verbatim SQL in DuckDB — LEAD end-of-day pairing on balance/price/"
        "eth-price, receipts decomposition, coalesce-0 rate fallback"
    ),
)
def datamart_inv_lst_real(spark, sf_dir):
    from aave_etl_spark.plans import run_datamart

    inputs = {name: spark.sql(sql) for name, sql in _LST_INPUTS.items()}
    subset = {"inv_lst_performance_base": MODELS["inv_lst_performance_base"]}
    return run_datamart(spark, inputs, models=subset)["inv_lst_performance_base"]

# ---------------------------------------------------------------------------
# Consolidated treasury rollup family: treasury_totals + the seven rollup
# heads that hang off all_treasury_balances / all_financials, every model's
# SQL VERBATIM on both engines, sharing ONE registry slot via the
# union-aligned projection (_head_select — pure renames + typed-NULL pads,
# so the driver compare stays row-level exact per model).
# ---------------------------------------------------------------------------
_TTR_MODELS = (
    "treasury_totals",
    "treasury_totals_latest",
    "treasury_value_by_chain",
    "treasury_value_by_market",
    "treasury_value_by_chain_ex_reserve",
    "treasury_value_by_balance_group",
    "stablecoin_totals",
    "all_revenue",
)

_TTR_ALIGN = "\nUNION ALL\n".join(
    [
        _head_select("treasury_totals", "treasury_totals",
                     s=("measure",), v=("value_usd",), ns=9, nv=3),
        _head_select("treasury_totals_latest", "treasury_totals_latest",
                     s=("measure",), v=("value_usd",), ns=9, nv=3),
        _head_select("treasury_value_by_chain", "treasury_value_by_chain",
                     s=("display_chain",),
                     v=("value_usd", "stablecoin_value_usd", "ex_aave_value_usd"),
                     ns=9, nv=3),
        _head_select("treasury_value_by_market", "treasury_value_by_market",
                     s=("display_chain", "display_market"),
                     v=("value_usd", "stablecoin_value_usd", "ex_aave_value_usd"),
                     ns=9, nv=3),
        _head_select("treasury_value_by_chain_ex_reserve",
                     "treasury_value_by_chain_ex_reserve",
                     s=("display_chain",), v=("ex_reserve_usd",), ns=9, nv=3),
        _head_select("treasury_value_by_balance_group",
                     "treasury_value_by_balance_group",
                     s=("display_chain", "display_market", "collector_label",
                        "balance_group"),
                     v=("value_usd", "value_native"), ns=9, nv=3),
        _head_select("stablecoin_totals", "stablecoin_totals",
                     s=("stablecoin_group",), v=("value_usd",), ns=9, nv=3),
        _head_select("all_revenue", "all_revenue",
                     s=("market", "chain", "display_name", "display_chain",
                        "token", "symbol", "underlying_reserve",
                        "underlying_reserve_symbol", "currency"),
                     v=("revenue",), ns=9, nv=3),
    ]
)


def _oracle_ttr() -> str:
    model_ctes = ",\n".join(f"{m} AS ({MODELS[m].sql})" for m in _TTR_MODELS)
    return f"""
WITH all_financials AS ({_DERIVE_AF}),
display_names AS ({_DERIVE_NAMES3}),
paraswap_legacy_fees AS ({_DERIVE_LEGACY}),
paraswap_legacy_claimable_fees AS ({_WH_LEGACY_SQL}),
balance_group_lookup AS ({_DERIVE_BGL}),
token_prices_by_day AS ({_DERIVE_TP3}),
chains_markets AS ({MODELS["chains_markets"].sql}),
all_treasury_balances AS ({MODELS["all_treasury_balances"].sql}),
{model_ctes}
{_TTR_ALIGN}
"""


@register(
    "datamart_treasury_rollups_real",
    oracle=_oracle_ttr(),
    doc=(
        "REAL datamart SQL under the driver gate (treasury rollup family,"
        " 8 models in one aligned head): treasury_totals 3-way rollup,"
        " treasury_totals_latest scalar subquery, treasury_value_by_"
        "{chain,market,chain_ex_reserve,balance_group}, stablecoin_totals,"
        " all_revenue income rollup — verbatim model SQL on both engines"
    ),
)
def datamart_treasury_rollups_real(spark, sf_dir):
    from dataclasses import replace as dc_replace

    from aave_etl_spark.plans import run_datamart
    from aave_etl_spark.warehouse.liquidity import paraswap_legacy_claimable_fees

    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    spark.sql(_DERIVE_AF).createOrReplaceTempView("all_financials")
    inputs = {
        "display_names": spark.sql(_DERIVE_NAMES3),
        "paraswap_legacy_claimable_fees": paraswap_legacy_claimable_fees(
            spark.sql(_DERIVE_LEGACY)
        ),
        "balance_group_lookup": spark.sql(_DERIVE_BGL),
        "token_prices_by_day": spark.sql(_DERIVE_TP3),
    }
    subset = {
        "chains_markets": MODELS["chains_markets"],
        "all_treasury_balances": dc_replace(
            MODELS["all_treasury_balances"], refs=("chains_markets",)
        ),
    }
    for m in _TTR_MODELS:
        subset[m] = MODELS[m] if m != "all_revenue" else dc_replace(MODELS[m], refs=())
    run_datamart(spark, inputs, models=subset)
    return spark.sql(_TTR_ALIGN)


# ---------------------------------------------------------------------------
# Consolidated safety-module family: the seven sm_* rollups off
# safety_module_totals_by_day PLUS the TVL coverage trio
# (asset_tvl_by_day → sm_covered_markets_tvl_by_day →
# sm_percentage_tvl_coverage_by_day), ten models verbatim in one aligned
# head. TVL inputs derive from `supplier` with days straddling all four
# epoch windows of the covered-markets CASE; 2024-01 days overlap the
# chain-1 sm days so the percentage join produces rows.
# ---------------------------------------------------------------------------
_TVL_DAYS = (
    "(VALUES (TIMESTAMP '2022-07-30'), (TIMESTAMP '2022-08-02'),"
    " (TIMESTAMP '2023-03-01'), (TIMESTAMP '2024-01-01'),"
    " (TIMESTAMP '2024-01-02'), (TIMESTAMP '2024-01-03')) AS d(block_day)"
)

# markets cover all four epoch-window branch lists; harmony_v3 is never
# covered (drops from sm_covered_markets only)
_TVL_STATE = f"""
SELECT
  d.block_day, CAST(1 AS BIGINT) AS block_height,
  CASE s.s_suppkey % 4 WHEN 0 THEN 'ethereum_v2' WHEN 1 THEN 'polygon_v2'
       WHEN 2 THEN 'polygon_v3' ELSE 'harmony_v3' END AS market,
  concat('0xr_', CAST(s.s_suppkey AS STRING)) AS reserve,
  concat('a', s.s_name) AS atoken_symbol,
  CAST(0 AS DOUBLE) AS unbacked_atokens, CAST(0 AS DOUBLE) AS scaled_accrued_to_treasury,
  1000 + CAST(s.s_suppkey AS DOUBLE)
    + CAST(extract(day FROM d.block_day) AS DOUBLE) AS atoken_supply,
  CAST(s.s_suppkey % 11 AS DOUBLE) * 10 AS stable_debt,
  CAST(s.s_suppkey % 13 AS DOUBLE) * 20 AS variable_debt,
  CAST(s.s_suppkey % 5 AS DOUBLE) / 100 AS liquidity_rate,
  CAST(s.s_suppkey % 7 AS DOUBLE) / 100 AS variable_borrow_rate,
  CAST(s.s_suppkey % 9 AS DOUBLE) / 100 AS stable_borrow_rate,
  CAST(0 AS DOUBLE) AS average_stable_rate,
  CAST(1.01 AS DOUBLE) AS liquidity_index, CAST(1.02 AS DOUBLE) AS variable_borrow_index,
  500 + CAST(s.s_suppkey AS DOUBLE) AS available_liquidity
FROM supplier s CROSS JOIN {_TVL_DAYS}
"""

# one names row per market + an excluded Ecosystem Reserve label
_TVL_NAMES = """
SELECT * FROM (VALUES
  ('0xc1', 'ethereum', 'ethereum_v2', 'Ethereum', 'Ethereum V2'),
  ('0xc2', 'polygon', 'polygon_v2', 'Polygon', 'Polygon V2'),
  ('0xc3', 'polygon', 'polygon_v3', 'Polygon', 'Polygon V3'),
  ('0xc4', 'harmony', 'harmony_v3', 'Harmony', 'Harmony V3'),
  ('0xc5', 'ethereum', 'ethereum_v2', 'Ethereum', 'Ecosystem Reserve'))
  AS v(collector, chain, market, display_chain, display_name)
"""

# TVL reserve prices: k%5=4 reserves stay unpriced (NULL usd rows); k%7=0
# adds an 'ETH'-symbol decoy that the asset_tvl prefilter must exclude
_TVL_TP = f"""
SELECT d.block_day,
  CASE s.s_suppkey % 4 WHEN 0 THEN 'ethereum' WHEN 1 THEN 'polygon'
       WHEN 2 THEN 'polygon' ELSE 'harmony' END AS chain,
  concat('0xr_', CAST(s.s_suppkey AS STRING)) AS reserve,
  concat('a', s.s_name) AS symbol,
  1 + CAST(s.s_suppkey % 50 AS DOUBLE) AS usd_price,
  'aave_oracle' AS pricing_source
FROM supplier s CROSS JOIN {_TVL_DAYS} WHERE s.s_suppkey % 5 != 4
UNION ALL
SELECT d.block_day,
  CASE s.s_suppkey % 4 WHEN 0 THEN 'ethereum' WHEN 1 THEN 'polygon'
       WHEN 2 THEN 'polygon' ELSE 'harmony' END,
  concat('0xr_', CAST(s.s_suppkey AS STRING)), 'ETH', CAST(9999 AS DOUBLE), 'aave_oracle'
FROM supplier s CROSS JOIN {_TVL_DAYS} WHERE s.s_suppkey % 7 = 0
"""

_SMR_SM_HEADS = (
    ("sm_staked_tokens_by_day", ("stk_token_symbol",), ("stk_tokens",)),
    ("sm_staked_value_by_day", ("stk_token_symbol",), ("staked_value_usd",)),
    ("sm_token_emissions_by_day", ("stk_token_symbol",), ("emission_per_day",)),
    ("sm_staking_apr_by_day", ("stk_token_symbol",), ("staking_apr",)),
    ("sm_emissions_usd_by_day", (), ("emission_usd",)),
    ("sm_protocol_cover_by_day", (), ("protocol_cover",)),
    ("sm_cost_of_cover_by_day", (), ("annual_cost_of_cover_percent",)),
    (
        "asset_tvl_by_day",
        ("reserve", "reserve_symbol", "atoken_symbol", "market", "chain",
         "display_name", "display_chain"),
        ("deposits", "stable_loans", "variable_loans", "loans", "usd_price",
         "tvl", "deposits_usd", "stable_loans_usd", "variable_loans_usd",
         "loans_usd", "tvl_usd"),
    ),
    ("sm_covered_markets_tvl_by_day", ("aave_market",), ("tvl",)),
    ("sm_percentage_tvl_coverage_by_day", (), ("percentage_covered",)),
)

_SMR_ALIGN = "\nUNION ALL\n".join(
    _head_select(m, m, s=s, v=v, ns=7, nv=11) for m, s, v in _SMR_SM_HEADS
)

# CTE order = topo order (percentage needs covered + protocol_cover)
_SMR_MODELS = (
    "safety_module_totals_by_day",
    "sm_staked_tokens_by_day",
    "sm_staked_value_by_day",
    "sm_token_emissions_by_day",
    "sm_staking_apr_by_day",
    "sm_emissions_usd_by_day",
    "sm_protocol_cover_by_day",
    "sm_cost_of_cover_by_day",
    "market_state_by_day",
    "asset_tvl_by_day",
    "sm_covered_markets_tvl_by_day",
    "sm_percentage_tvl_coverage_by_day",
)


def _oracle_smr() -> str:
    model_ctes = ",\n".join(f"{m} AS ({MODELS[m].sql})" for m in _SMR_MODELS)
    return f"""
WITH safety_module_rpc AS ({_DERIVE_SM_RPC}),
token_prices_by_day AS ({_DERIVE_PRICES}
UNION ALL
{_TVL_TP}),
coingecko_data_by_day AS ({_DERIVE_CG}),
warehouse_market_state_by_day AS ({_TVL_STATE}),
display_names AS ({_TVL_NAMES}),
{model_ctes}
{_SMR_ALIGN}
"""


@register(
    "datamart_sm_rollups_real",
    oracle=_oracle_smr(),
    doc=(
        "REAL datamart SQL under the driver gate (safety-module family, 10"
        " models in one aligned head): the seven sm_* rollups off"
        " safety_module_totals_by_day plus asset_tvl_by_day →"
        " sm_covered_markets_tvl_by_day (4-epoch market windows) →"
        " sm_percentage_tvl_coverage_by_day, verbatim on both engines"
    ),
)
def datamart_sm_rollups_real(spark, sf_dir):
    from aave_etl_spark.plans import run_datamart

    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    inputs = {
        "safety_module_rpc": spark.sql(_DERIVE_SM_RPC),
        "token_prices_by_day": spark.sql(
            f"{_DERIVE_PRICES}\nUNION ALL\n{_TVL_TP}"
        ),
        "coingecko_data_by_day": spark.sql(_DERIVE_CG),
        "warehouse_market_state_by_day": spark.sql(_TVL_STATE),
        "display_names": spark.sql(_TVL_NAMES),
    }
    subset = {m: MODELS[m] for m in _SMR_MODELS}
    run_datamart(spark, inputs, models=subset)
    return spark.sql(_SMR_ALIGN)


# ---------------------------------------------------------------------------
# Market-state time chain verbatim: market_state_by_hour (pow-APY
# compounding) + market_state_by_day UNION → DISTINCT dedup (the midnight
# hour row collapses against the day row — exercised on both engines) →
# chains_markets/aave_atokens/prices dim join with a date_trunc-derived
# key. Five models verbatim over the chain-2 supplier derivations.
# ---------------------------------------------------------------------------
_MST_HOURS = (
    "(VALUES (TIMESTAMP '2024-02-01 00:00:00'), (TIMESTAMP '2024-02-01 01:00:00'))"
    " AS h(block_hour)"
)

# midnight rows carry exactly the day-table state → true duplicates for the
# DISTINCT; the 01:00 rows shift supply so they survive
_MST_PDH = f"""
SELECT
  h.block_hour, CAST(1 AS BIGINT) AS block_height, 'ethereum_v2' AS market,
  concat('0xr_', CAST(s.s_suppkey AS STRING)) AS reserve,
  concat('a', s.s_name) AS symbol,
  CAST(0 AS DOUBLE) AS unbacked_atokens, CAST(0 AS DOUBLE) AS scaled_accrued_to_treasury,
  1000 + CAST(s.s_suppkey AS DOUBLE)
    + (CASE WHEN extract(hour FROM h.block_hour) = 1 THEN 7.0 ELSE 0.0 END) AS atoken_supply,
  CAST(s.s_suppkey % 11 AS DOUBLE) * 10 AS stable_debt,
  CAST(s.s_suppkey % 13 AS DOUBLE) * 20 AS variable_debt,
  CAST(s.s_suppkey % 5 AS DOUBLE) / 100 AS liquidity_rate,
  CAST(s.s_suppkey % 7 AS DOUBLE) / 100 AS variable_borrow_rate,
  CAST(s.s_suppkey % 9 AS DOUBLE) / 100 AS stable_borrow_rate,
  CAST(0 AS DOUBLE) AS average_stable_rate,
  CAST(1.01 AS DOUBLE) AS liquidity_index, CAST(1.02 AS DOUBLE) AS variable_borrow_index,
  1000 + CAST(s.s_suppkey AS DOUBLE) AS available_liquidity,
  CAST(18 AS BIGINT) AS decimals,
  CAST(0.8 AS DOUBLE) AS ltv, CAST(0.85 AS DOUBLE) AS liquidation_threshold,
  CAST(1.05 AS DOUBLE) AS liquidation_bonus,
  CAST(10 + s.s_suppkey % 20 AS DOUBLE) / 100 AS reserve_factor,
  s.s_suppkey % 2 = 0 AS usage_as_collateral_enabled,
  s.s_suppkey % 3 != 1 AS borrowing_enabled,
  s.s_suppkey % 5 = 0 AS stable_borrow_rate_enabled,
  TRUE AS is_active,
  s.s_suppkey % 7 = 0 AS is_frozen,
  CAST(CASE WHEN extract(hour FROM h.block_hour) = 0
       THEN s.s_suppkey % 3 ELSE s.s_suppkey % 5 END AS BIGINT) AS reserve_emode_category,
  CAST(1000 + s.s_suppkey % 50 AS DOUBLE) AS borrow_cap,
  CAST(2000 + s.s_suppkey % 50 AS DOUBLE) AS supply_cap,
  FALSE AS is_paused,
  s.s_suppkey % 11 = 0 AS siloed_borrowing,
  CAST(0.1 AS DOUBLE) AS liquidation_protocol_fee,
  CAST(0 AS DOUBLE) AS unbacked_mint_cap,
  CAST(s.s_suppkey AS DOUBLE) * 100 AS debt_ceiling
FROM supplier s CROSS JOIN {_MST_HOURS}
"""

# emode rows exist for categories 0/1 only: hour rows whose category has no
# match carry NULL emode fields and the last_value IGNORE NULLS forward
# fill (market_config_by_hour) is exercised in both directions
_MST_EMODE = """
SELECT * FROM (VALUES
  (TIMESTAMP '2024-02-01', CAST(1 AS BIGINT), 'ethereum_v2', CAST(0 AS BIGINT), 'stable-e',
   CAST(0.93 AS DOUBLE), CAST(1.01 AS DOUBLE), CAST(0.95 AS DOUBLE), '0xep'),
  (TIMESTAMP '2024-02-01', CAST(1 AS BIGINT), 'ethereum_v2', CAST(1 AS BIGINT), 'eth-e',
   CAST(0.9 AS DOUBLE), CAST(1.02 AS DOUBLE), CAST(0.93 AS DOUBLE), '0xep'))
  AS v(block_day, block_height, market, reserve_emode_category, emode_category_name,
       emode_ltv, emode_liquidation_bonus, emode_liquidation_threshold,
       emode_price_address)
"""

# reserve prices for the rf-income-by-hour head; k%4=2 reserves unpriced
_MST_TP = f"""
SELECT d.block_day, 'ethereum' AS chain,
  concat('0xr_', CAST(s.s_suppkey AS STRING)) AS reserve,
  concat('a', s.s_name) AS symbol,
  2 + CAST(s.s_suppkey % 40 AS DOUBLE) AS usd_price,
  'aave_oracle' AS pricing_source
FROM supplier s CROSS JOIN {_DAYS2} WHERE s.s_suppkey % 4 != 2
"""

_MST_BND = "SELECT 'ethereum_v2' AS market, 'ethereum' AS chain"

_MST_MTB = """
SELECT concat('0xa_', CAST(s.s_suppkey AS STRING)) AS atoken,
  concat('a', s.s_name) AS atoken_symbol, CAST(18 AS BIGINT) AS atoken_decimals,
  concat('0xr_', CAST(s.s_suppkey AS STRING)) AS reserve, s.s_name AS symbol,
  CAST(18 AS BIGINT) AS decimals, concat('tok_', s.s_name) AS name,
  'ethereum_v2' AS market, '0xpool' AS pool, TIMESTAMP '2024-02-01' AS block_day
FROM supplier s
"""

_MST_ORC = f"""
SELECT d.block_day, concat('0xr_', CAST(s.s_suppkey AS STRING)) AS reserve,
  'ethereum_v2' AS market, 1 + CAST(s.s_suppkey % 50 AS DOUBLE) AS usd_price
FROM supplier s CROSS JOIN {_DAYS2}
"""

# lake-layer fixtures; the two warehouse views are NOT fixtures — they are
# produced by the real transforms (warehouse/market.py) on the Spark side
# and by their SQL twins (_WH_STATE_SQL/_WH_CONFIG_SQL) on the oracle side
_MST_LAKE_INPUTS = {
    "protocol_data_by_hour": _MST_PDH,
    "protocol_data_by_day": _DERIVE_PROTOCOL_DATA,
    "emode_config_by_day": _MST_EMODE,
    "token_prices_by_day": _MST_TP,
    "display_names": _DERIVE_NAMES,
    "aave_oracle_prices_by_day": _MST_ORC,
    "block_numbers_by_day": _MST_BND,
    "market_tokens_by_day": _MST_MTB,
}

_MST_MODELS = (
    "chains_markets",
    "aave_atokens",
    "market_state_by_hour",
    "market_state_by_day",
    "market_state_by_time",
    "market_config_by_hour",
    "market_config_by_day",
    "market_config_by_time",
    "reserve_factor_income_by_hour",
)

# the seven non-null config booleans ride one packed string slot
_MST_BOOLPACK = (
    "CAST(usage_as_collateral_enabled AS STRING) || '|' ||"
    " CAST(borrowing_enabled AS STRING) || '|' ||"
    " CAST(stable_borrow_rate_enabled AS STRING) || '|' ||"
    " CAST(is_active AS STRING) || '|' || CAST(is_frozen AS STRING) || '|' ||"
    " CAST(is_paused AS STRING) || '|' || CAST(siloed_borrowing AS STRING)"
)

_MST_ALIGN = "\nUNION ALL\n".join(
    [
        _head_select(
            "market_state_by_time", "market_state_by_time", t0="block_time",
            s=("market", "reserve", "atoken_symbol", "chain", "display_chain",
               "display_market", "reserve_symbol"),
            v=("CAST(block_height AS DOUBLE)", "unbacked_atokens",
               "scaled_accrued_to_treasury", "atoken_supply", "stable_debt",
               "variable_debt", "liquidity_rate", "variable_borrow_rate",
               "stable_borrow_rate", "average_stable_rate", "liquidity_index",
               "variable_borrow_index", "available_liquidity", "deposit_apy",
               "variable_borrow_apy", "stable_borrow_apy",
               "av_stable_borrow_apy", "usd_price", "deposits_usd",
               "stable_debt_usd", "variable_debt_usd"),
            ns=9, nv=21,
        ),
        _head_select(
            "market_config_by_time", "market_config_by_time", t0="block_time",
            s=("market", "reserve", "atoken_symbol", "emode_category_name",
               "chain", "display_chain", "display_market", "reserve_symbol",
               _MST_BOOLPACK),
            v=("CAST(block_height AS DOUBLE)", "CAST(decimals AS DOUBLE)",
               "ltv", "liquidation_threshold", "liquidation_bonus",
               "reserve_factor", "CAST(reserve_emode_category AS DOUBLE)",
               "borrow_cap", "supply_cap", "liquidation_protocol_fee",
               "unbacked_mint_cap", "debt_ceiling", "emode_ltv",
               "emode_liquidation_bonus", "emode_liquidation_threshold"),
            ns=9, nv=21,
        ),
        _head_select(
            "reserve_factor_income_by_hour", "reserve_factor_income_by_hour",
            t0="block_hour",
            s=("market", "chain", "display_chain", "display_market",
               "atoken_symbol"),
            v=("reserve_factor", "variable_borrow_rate", "variable_debt",
               "stable_borrow_rate", "stable_debt",
               "variable_debt_protocol_income", "stable_debt_protocol_income",
               "usd_price", "daily_income_usd"),
            ns=9, nv=21,
        ),
    ]
)


def _oracle_mst() -> str:
    ctes = ",\n".join(f"{name} AS ({sql})" for name, sql in _MST_LAKE_INPUTS.items())
    wh_ctes = (
        f"warehouse_market_state_by_day AS ({_WH_STATE_SQL}),\n"
        f"warehouse_market_config_by_day AS ({_WH_CONFIG_SQL})"
    )
    model_ctes = ",\n".join(
        f"{name} AS ({_duck_dialect(MODELS[name].sql)})" for name in _MST_MODELS
    )
    return f"""
WITH {ctes},
{wh_ctes},
{model_ctes}
{_MST_ALIGN}
"""


@register(
    "datamart_market_state_by_time_real",
    oracle=_oracle_mst(),
    doc=(
        "REAL datamart SQL under the driver gate (state/config time chain,"
        " 9 models in three aligned heads): pow-APY hourly state + daily"
        " state UNION with DISTINCT midnight dedup, market_config_by_hour"
        " (last_value IGNORE NULLS emode forward fill — DuckDB syntax"
        " rewritten by _duck_dialect), market_config_by_time 26-col UNION"
        " dedup + 3-dim join, reserve_factor_income_by_hour income"
        " arithmetic over the hour join"
    ),
)
def datamart_market_state_by_time_real(spark, sf_dir):
    from aave_etl_spark.plans import run_datamart

    from aave_etl_spark.warehouse.market import market_config_by_day, market_state_by_day

    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    inputs = {name: spark.sql(sql) for name, sql in _MST_LAKE_INPUTS.items()}
    inputs["warehouse_market_state_by_day"] = market_state_by_day(
        inputs["protocol_data_by_day"]
    )
    inputs["warehouse_market_config_by_day"] = market_config_by_day(
        inputs["protocol_data_by_day"], inputs["emode_config_by_day"]
    )
    subset = {k: MODELS[k] for k in _MST_MODELS}
    run_datamart(spark, inputs, models=subset)
    return spark.sql(_MST_ALIGN)


# ---------------------------------------------------------------------------
# BPT + grants chain verbatim: balancer_bpt_by_day (LAG coalesce-to-self
# daily APR — the named SURVEY §2.5 citation) and
# grants_dao_token_balances_by_day (wallet-filtered lake balances with the
# atoken→reserve coalesce price fallback). Two unrelated single-model
# heads share one registry slot via a union-aligned projection whose SQL
# text is IDENTICAL on both engines (row-level compare, not a fingerprint).
# ---------------------------------------------------------------------------
_BGQ_DAYS = (
    "(VALUES (TIMESTAMP '2024-05-01'), (TIMESTAMP '2024-05-02'),"
    " (TIMESTAMP '2024-05-03')) AS d(block_day)"
)

# k%5=0 pools hold a constant rate (daily_apr = 0); all pools' first day
# exercises the coalesce-to-self arm (lag NULL -> apr 0)
# LAKE fixture (S19 scan shape): the WAREHOUSE table is no longer
# synthesized — it's computed by warehouse/bpt.py balancer_bpt_by_day over
# this lake table + token prices, with the identical join/price math
# mirrored in SQL for the oracle (_BGQ_BPT_WH). Odd-nation rows are
# 'polygon' (no price row -> coalesce-to-1 arm); k%4=3 ethereum rows have
# no oracle price either.
_BGQ_BPT_LAKE = f"""
SELECT d.block_day,
  CASE WHEN n.n_nationkey % 2 = 0 THEN 'ethereum' ELSE 'polygon' END AS chain,
  concat('B-80AAVE-20WETH-', lower(n.n_name)) AS symbol,
  concat('Balancer 80/20 ', n.n_name) AS name,
  concat('0xpool_', lower(n.n_name)) AS pool,
  'AAVE' AS denom,
  concat('0xres_', lower(n.n_name)) AS price_token,
  n.n_name AS price_symbol,
  CAST(18 AS BIGINT) AS decimals,
  CAST(1000000 AS BIGINT) + n.n_nationkey AS block_height,
  CAST(1 AS DOUBLE) + CAST(n.n_nationkey % 7 AS DOUBLE) * 0.03125
    + CAST(extract(day FROM d.block_day) AS DOUBLE)
      * CAST(n.n_nationkey % 5 AS DOUBLE) * 0.015625 AS rate,
  CAST(10000 AS DOUBLE) + CAST(n.n_nationkey AS DOUBLE) * 100 AS actual_supply
FROM nation n CROSS JOIN {_BGQ_DAYS}
"""

# SQL twin of warehouse/bpt.py balancer_bpt_by_day (the oracle's view of
# the Spark transform): price join on (chain, day, price_token=reserve,
# price_symbol=symbol), missing price -> 1, bpt price and TVL products
_BGQ_BPT_WH = """
SELECT b.block_day, b.chain, b.symbol, b.name, b.pool, b.denom,
       b.price_token, b.price_symbol, b.decimals, b.block_height,
       b.rate, b.actual_supply,
       coalesce(p.usd_price, 1.0) AS underlying_asset_price,
       b.rate * coalesce(p.usd_price, 1.0) AS bpt_usd_price,
       b.rate * coalesce(p.usd_price, 1.0) * b.actual_supply AS pool_tvl_usd
FROM balancer_bpt_data_by_day b
LEFT JOIN token_prices_by_day p
  ON b.chain = p.chain AND b.block_day = p.block_day
 AND b.price_token = p.reserve AND b.price_symbol = p.symbol
"""

_BGQ_WALLET = "0x89c51828427f70d77875c6747759fb17ba10ceb0"

# k%5=4 rows belong to another wallet (filter exercise); even k rows carry
# an atoken address (reserve remap), odd k a raw address (coalesce
# fallback); k%3=1 atoken rows have no aave_atokens match -> unpriced
_BGQ_ERC20 = f"""
SELECT d.block_day, 'ethereum' AS chain,
  n.n_name AS token,
  CASE WHEN n.n_nationkey % 2 = 0 THEN concat('0xatk_', lower(n.n_name))
       ELSE concat('0xraw_', lower(n.n_name)) END AS token_address,
  CAST(100 AS DOUBLE) + CAST(n.n_nationkey AS DOUBLE) * 3
    + CAST(extract(day FROM d.block_day) AS DOUBLE) AS balance,
  CASE WHEN n.n_nationkey % 5 = 4 THEN '0xother' ELSE '{_BGQ_WALLET}' END AS wallet_address
FROM nation n CROSS JOIN {_BGQ_DAYS}
"""

_BGQ_ATOKENS = """
SELECT concat('0xatk_', lower(n.n_name)) AS atoken, concat('a', n.n_name) AS atoken_symbol,
  CAST(18 AS BIGINT) AS atoken_decimals,
  concat('0xres_', lower(n.n_name)) AS reserve, n.n_name AS reserve_symbol,
  CAST(18 AS BIGINT) AS reserve_decimals, concat('tok_', n.n_name) AS reserve_name,
  'ethereum_v2' AS market, 'ethereum' AS chain, '0xpool' AS lending_pool
FROM nation n WHERE n.n_nationkey % 3 != 1
"""

# reserves priced except k%4=3; raw addresses priced for k%4 in (1,2)
_BGQ_TP = f"""
SELECT d.block_day, 'ethereum' AS chain, concat('0xres_', lower(n.n_name)) AS reserve,
  n.n_name AS symbol, CAST(2 AS DOUBLE) + CAST(n.n_nationkey AS DOUBLE) * 0.125 AS usd_price,
  'aave_oracle' AS pricing_source
FROM nation n CROSS JOIN {_BGQ_DAYS} WHERE n.n_nationkey % 4 != 3
UNION ALL
SELECT d.block_day, 'ethereum', concat('0xraw_', lower(n.n_name)), n.n_name,
  CAST(1 AS DOUBLE) + CAST(n.n_nationkey AS DOUBLE) * 0.0625, 'coingecko'
FROM nation n CROSS JOIN {_BGQ_DAYS} WHERE n.n_nationkey % 4 IN (1, 2)
"""

# identical projection text runs on both engines over the two model views
_BGQ_ALIGN = """
SELECT 'balancer_bpt' AS head, block_day, chain AS s1, symbol AS s2, name AS s3,
       pool AS s4, bpt_underlying_asset AS s5,
       underlying_asset_price AS v1, rate AS v2, actual_supply AS v3,
       bpt_price_usd AS v4, pool_tvl_usd AS v5, daily_apr AS v6
FROM balancer_bpt_by_day
UNION ALL
SELECT 'grants_dao' AS head, block_day, CAST(NULL AS STRING) AS s1, token_symbol AS s2,
       CAST(NULL AS STRING) AS s3, CAST(NULL AS STRING) AS s4, CAST(NULL AS STRING) AS s5,
       price_usd AS v1, balance_native AS v2, balance_usd AS v3,
       CAST(NULL AS DOUBLE) AS v4, CAST(NULL AS DOUBLE) AS v5, CAST(NULL AS DOUBLE) AS v6
FROM grants_dao_token_balances_by_day
"""


def _oracle_bpt_grants() -> str:
    return f"""
WITH balancer_bpt_data_by_day AS ({_BGQ_BPT_LAKE}),
token_prices_by_day AS ({_BGQ_TP}),
warehouse_balancer_bpt_by_day AS ({_BGQ_BPT_WH}),
erc20_balances_by_day AS ({_BGQ_ERC20}),
aave_atokens AS ({_BGQ_ATOKENS}),
balancer_bpt_by_day AS ({MODELS["balancer_bpt_by_day"].sql}),
grants_dao_token_balances_by_day AS ({MODELS["grants_dao_token_balances_by_day"].sql})
{_BGQ_ALIGN}
"""


@register(
    "datamart_bpt_grants_real",
    oracle=_oracle_bpt_grants(),
    doc=(
        "REAL datamart SQL under the driver gate (models #61/#62):"
        " balancer_bpt_by_day LAG(rate) coalesce-to-self daily APR and"
        " grants_dao_token_balances_by_day wallet-filtered price enrichment,"
        " verbatim model SQL on both engines via a union-aligned head"
    ),
)
def datamart_bpt_grants_real(spark, sf_dir):
    from dataclasses import replace as dc_replace

    from aave_etl_spark.plans import run_datamart

    from aave_etl_spark.warehouse.bpt import balancer_bpt_by_day as wh_bpt

    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    token_prices = spark.sql(_BGQ_TP)
    inputs = {
        # the REAL warehouse transform (warehouse/bpt.py) over the lake
        # fixture — the oracle runs its SQL twin (_BGQ_BPT_WH)
        "warehouse_balancer_bpt_by_day": wh_bpt(spark.sql(_BGQ_BPT_LAKE), token_prices),
        "erc20_balances_by_day": spark.sql(_BGQ_ERC20),
        "token_prices_by_day": token_prices,
        "aave_atokens": spark.sql(_BGQ_ATOKENS),
    }
    subset = {
        "balancer_bpt_by_day": MODELS["balancer_bpt_by_day"],
        "grants_dao_token_balances_by_day": dc_replace(
            MODELS["grants_dao_token_balances_by_day"], refs=()
        ),
    }
    run_datamart(spark, inputs, models=subset)
    return spark.sql(_BGQ_ALIGN)


# ---------------------------------------------------------------------------
# Impact-proposal family: all 12 impact_proposal_* models (three generator
# shapes — purchase-price, state×revenue, rewards-joined) verbatim in one
# aligned head. Inputs are a shared derived universe: a (market, reserve)
# state grid covering every proposal's hardcoded reserve list, an
# all_revenue view with one token per (proposal, market, reserve) so the
# revenue joins stay 1:1, partial incentives coverage (MaticX absent →
# coalesce-0 arm), one unpriced reserve (NULL usd rows dropped by UNPIVOT
# on both engines), and purchase windows with in/out-of-window and
# zero-amount rows. add_months() is rewritten for DuckDB by _duck_dialect.
# ---------------------------------------------------------------------------
_IMP_DAYS = (
    "(VALUES (TIMESTAMP '2023-04-20'), (TIMESTAMP '2023-04-25'),"
    " (TIMESTAMP '2023-04-30')) AS d(block_day)"
)
_IMP_DD = "CAST(extract(day FROM d.block_day) AS DOUBLE)"

_IMP_STATE_PAIRS = (
    "(VALUES"
    " ('polygon_v3', '0xfa68fb4628dff1028cfec22b4162fccd0d45efb6', 'aSTMATIC', 1),"
    " ('polygon_v3', '0x0d500b1d8e8ef31e21c99d1db9a6444d3adf1270', 'aWMATIC', 2),"
    " ('polygon_v3', '0x3a58a54c066fdc0f2d55fc9c89f0415c92ebf3c4', 'aMATICX', 3),"
    " ('ethereum_v2', '0xc02aaa39b223fe8d0a0e5c4f27ead9083c756cc2', 'aWETH', 4),"
    " ('ethereum_v2', '0xba100000625a3754423978a60c9317c58a424e3d', 'aBAL', 5),"
    " ('ethereum_v2', '0x9a71012b13ca4d3d0cdc72a177df3ef03b0e76a3', 'aAGEUR', 6),"
    " ('polygon_v3', '0x9a71012b13ca4d3d0cdc72a177df3ef03b0e76a3', 'aAGEURP', 7),"
    " ('ethereum_v3', '0xd533a949740bb3306d119cc777fa900ba034cd52', 'aCRV', 8),"
    " ('polygon_v3', '0x172370d5cd63279efa6d502dab29171933a610af', 'aCRVP', 9),"
    " ('ethereum_v2', '0xd533a949740bb3306d119cc777fa900ba034cd52', 'aCRVE', 10))"
    " AS sp(market, reserve, atoken_symbol, rk)"
)

_IMP_REV_TRIPLES = (
    "(VALUES"
    " ('polygon_v3', '0xfa68fb4628dff1028cfec22b4162fccd0d45efb6', '0x80ca0d8c38d2e2bcbab66aa1648bd1c7160500fe', 1),"
    " ('polygon_v3', '0x0d500b1d8e8ef31e21c99d1db9a6444d3adf1270', '0x6d80113e533a2c0fe82eabd35f1875dcea89ea97', 2),"
    " ('polygon_v3', '0x3a58a54c066fdc0f2d55fc9c89f0415c92ebf3c4', '0xea1132120ddcdda2f119e99fa7a27a0d036f7ac9', 3),"
    " ('ethereum_v2', '0xc02aaa39b223fe8d0a0e5c4f27ead9083c756cc2', '0x030ba81f1c18d280636f32af80b9aad02cf0854e', 4),"
    " ('ethereum_v2', '0xba100000625a3754423978a60c9317c58a424e3d', '0x272f97b7a56a387ae942350bbc7df5700f8a4576', 5),"
    " ('ethereum_v2', '0x9a71012b13ca4d3d0cdc72a177df3ef03b0e76a3', '0xc4195d4060daeac44058ed668aa5efec50d77ff6', 6),"
    " ('polygon_v3', '0x9a71012b13ca4d3d0cdc72a177df3ef03b0e76a3', '0x8ffdf2de812095b1d19cb146e4c004587c0a0692', 7),"
    " ('ethereum_v3', '0xd533a949740bb3306d119cc777fa900ba034cd52', '0x7b95ec873268a6bfc6427e7a28e396db9d0ebc65', 8),"
    " ('ethereum_v3', '0xd533a949740bb3306d119cc777fa900ba034cd52', '0x8dae6cb04688c62d939ed9b68d32bc62e49970b1', 9),"
    " ('polygon_v3', '0x172370d5cd63279efa6d502dab29171933a610af', '0x513c7e3a9c69ca3e22550ef58ac1c0088e918fff', 10),"
    " ('ethereum_v2', '0xd533a949740bb3306d119cc777fa900ba034cd52', '0x3df8f92b7e798820ddcca2ebea7babda2c90c4ad', 11))"
    " AS rt(market, reserve, token, rk)"
)

_IMP_STATE = f"""
SELECT d.block_day, sp.market, sp.reserve, sp.atoken_symbol,
  1000 + CAST(sp.rk AS DOUBLE) * 7 + {_IMP_DD} AS atoken_supply,
  CAST(sp.rk AS DOUBLE) * 3 AS stable_debt,
  CAST(sp.rk AS DOUBLE) * 11 AS variable_debt,
  CAST(sp.rk AS DOUBLE) / 100 AS liquidity_rate,
  CAST(sp.rk AS DOUBLE) / 200 AS variable_borrow_rate
FROM {_IMP_STATE_PAIRS} CROSS JOIN {_IMP_DAYS}
"""

_IMP_REV = f"""
SELECT d.block_day, rt.market, rt.reserve AS underlying_reserve, rt.token,
  c.currency, (CAST(5 + rt.rk AS DOUBLE) + {_IMP_DD}) * c.mult AS revenue
FROM {_IMP_REV_TRIPLES}
CROSS JOIN {_IMP_DAYS}
CROSS JOIN (VALUES ('native', CAST(1 AS DOUBLE)), ('usd', CAST(2 AS DOUBLE))) AS c(currency, mult)
"""

# SD/LDO/stMATIC cover one polygon reserve each; MaticX absent everywhere
# (every head's maticx coalesce falls back to 0)
_IMP_INC = f"""
SELECT d.block_day, 'polygon_v3' AS market, rw.reserve, rw.reward_token_symbol,
  CAST(rw.rk AS DOUBLE) + {_IMP_DD} AS supply_rewards,
  CAST(rw.rk AS DOUBLE) * 0.5 AS variable_debt_rewards,
  CAST(rw.rk AS DOUBLE) * 0.25 AS stable_debt_rewards,
  CAST(rw.rk AS DOUBLE) / 1000 AS supply_rewards_apr,
  CAST(rw.rk AS DOUBLE) / 2000 AS variable_borrow_rewards_apr
FROM (VALUES
  ('0xfa68fb4628dff1028cfec22b4162fccd0d45efb6', 'SD', 1),
  ('0x0d500b1d8e8ef31e21c99d1db9a6444d3adf1270', 'LDO', 2),
  ('0x3a58a54c066fdc0f2d55fc9c89f0415c92ebf3c4', 'stMATIC', 3)) AS rw(reserve, reward_token_symbol, rk)
CROSS JOIN {_IMP_DAYS}
"""

# rk=6 reserve stays unpriced → its *_usd measures unpivot-drop
_IMP_ORC = f"""
SELECT d.block_day, sp.market, sp.reserve,
  1 + CAST(sp.rk AS DOUBLE) * 0.25 + {_IMP_DD} * 0.0625 AS usd_price
FROM {_IMP_STATE_PAIRS} CROSS JOIN {_IMP_DAYS}
WHERE sp.rk != 6
"""

# purchase windows: 7-18/7-19 in-window for #87, 11-20/12-01 for #115,
# 7-20 has amount 0 (filtered), plus a wrong-contract decoy row; the
# 2023-05-01 price row is the global-max current_price day
_IMP_NAM = """
SELECT * FROM (VALUES
  (TIMESTAMP '2022-07-18', '0xba100000625a3754423978a60c9317c58a424e3d', 'BAL', CAST(40 AS DOUBLE), '0x464c71f6c2f760dda6093dcb91c24c39e5d6e18c'),
  (TIMESTAMP '2022-07-19', '0xba100000625a3754423978a60c9317c58a424e3d', 'BAL', CAST(25 AS DOUBLE), '0x464c71f6c2f760dda6093dcb91c24c39e5d6e18c'),
  (TIMESTAMP '2022-07-20', '0xba100000625a3754423978a60c9317c58a424e3d', 'BAL', CAST(0 AS DOUBLE), '0x464c71f6c2f760dda6093dcb91c24c39e5d6e18c'),
  (TIMESTAMP '2022-11-20', '0xba100000625a3754423978a60c9317c58a424e3d', 'BAL', CAST(30 AS DOUBLE), '0x464c71f6c2f760dda6093dcb91c24c39e5d6e18c'),
  (TIMESTAMP '2022-12-01', '0xba100000625a3754423978a60c9317c58a424e3d', 'BAL', CAST(15 AS DOUBLE), '0x464c71f6c2f760dda6093dcb91c24c39e5d6e18c'),
  (TIMESTAMP '2022-07-18', '0xba100000625a3754423978a60c9317c58a424e3d', 'BAL', CAST(99 AS DOUBLE), '0xother'))
  AS v(block_day, token, symbol, tokens_in_external, contract_address)
"""

_IMP_TP = """
SELECT * FROM (VALUES
  (TIMESTAMP '2022-07-18', 'ethereum', '0xba100000625a3754423978a60c9317c58a424e3d', 'BAL', CAST(5.5 AS DOUBLE)),
  (TIMESTAMP '2022-07-19', 'ethereum', '0xba100000625a3754423978a60c9317c58a424e3d', 'BAL', CAST(5.25 AS DOUBLE)),
  (TIMESTAMP '2022-07-20', 'ethereum', '0xba100000625a3754423978a60c9317c58a424e3d', 'BAL', CAST(5.75 AS DOUBLE)),
  (TIMESTAMP '2022-11-20', 'ethereum', '0xba100000625a3754423978a60c9317c58a424e3d', 'BAL', CAST(6.25 AS DOUBLE)),
  (TIMESTAMP '2022-12-01', 'ethereum', '0xba100000625a3754423978a60c9317c58a424e3d', 'BAL', CAST(6.5 AS DOUBLE)),
  (TIMESTAMP '2023-05-01', 'ethereum', '0xba100000625a3754423978a60c9317c58a424e3d', 'BAL', CAST(7.5 AS DOUBLE)),
  (TIMESTAMP '2022-07-18', 'polygon', '0xba100000625a3754423978a60c9317c58a424e3d', 'BAL', CAST(99 AS DOUBLE)))
  AS v(block_day, chain, reserve, symbol, usd_price)
"""

_IMP_INPUTS = {
    "warehouse_market_state_by_day": _IMP_STATE,
    "all_revenue": _IMP_REV,
    "incentives_by_day": _IMP_INC,
    "aave_oracle_prices_by_day": _IMP_ORC,
    "non_atoken_measures_by_day": _IMP_NAM,
    "token_prices_by_day": _IMP_TP,
}

_IMP_MODELS = (
    "impact_proposal_87", "impact_proposal_115", "impact_proposal_130",
    "impact_proposal_131", "impact_proposal_150", "impact_proposal_151",
    "impact_proposal_158", "impact_proposal_163", "impact_proposal_167",
    "impact_proposal_168", "impact_proposal_172", "impact_proposal_175",
)

_IMP_PURCHASE = {"impact_proposal_87", "impact_proposal_115"}


def _imp_head(m: str) -> str:
    if m in _IMP_PURCHASE:
        return _head_select(
            m, m,
            s=("token_address", "symbol"),
            v=("purchase_amount", "purchase_amount_usd", "av_purchase_price",
               "current_price", "current_value", "net_value_change"),
            ns=4, nv=6,
        )
    return _head_select(
        m, m, s=("market", "reserve", "atoken_symbol", "measure"),
        v=("value",), ns=4, nv=6,
    )


_IMP_ALIGN = "\nUNION ALL\n".join(_imp_head(m) for m in _IMP_MODELS)


def _oracle_imp() -> str:
    ctes = ",\n".join(f"{name} AS ({sql})" for name, sql in _IMP_INPUTS.items())
    model_ctes = ",\n".join(
        f"{m} AS ({_duck_dialect(MODELS[m].sql)})" for m in _IMP_MODELS
    )
    return f"""
WITH {ctes},
{model_ctes}
{_IMP_ALIGN}
"""


@register(
    "datamart_impact_proposal_real",
    oracle=_oracle_imp(),
    doc=(
        "REAL datamart SQL under the driver gate (impact family, 12 models in"
        " one aligned head): all impact_proposal_* parameterizations across"
        " the three generator shapes — purchase-price (scalar-subquery"
        " current price), state×revenue UNPIVOT, rewards-joined with"
        " 4-token coalesce stack — verbatim on both engines (add_months"
        " rewritten for DuckDB)"
    ),
)
def datamart_impact_proposal_real(spark, sf_dir):
    from dataclasses import replace as dc_replace

    from aave_etl_spark.plans import run_datamart

    inputs = {name: spark.sql(sql) for name, sql in _IMP_INPUTS.items()}
    subset = {m: dc_replace(MODELS[m], refs=()) for m in _IMP_MODELS}
    run_datamart(spark, inputs, models=subset)
    return spark.sql(_IMP_ALIGN)


# ---------------------------------------------------------------------------
# Misc source-fed family: the eight remaining standalone datamart models —
# safety-module holder stats (incl. the UNNEST-bucketing distro with its
# max-day scalar subquery), Balancer pool contents, liquidity-mining
# incentives passthrough, MATIC-LSD token supply, and the three
# liquidity-depth models — verbatim in one aligned head. The distro's
# inline(array(struct(...))) sort-order table is rewritten to VALUES for
# DuckDB by _duck_dialect.
# ---------------------------------------------------------------------------
_MSC_DAYS = (
    "(VALUES (TIMESTAMP '2024-06-01'), (TIMESTAMP '2024-06-02')) AS d(block_day)"
)
_MSC_DD = "CAST(extract(day FROM d.block_day) AS DOUBLE)"

# log-spaced balances hit every holder bucket of both tokens; the max-day
# subquery keeps only 06-02
_MSC_HODL = f"""
SELECT d.block_day, tk.safety_module_token,
  concat('0xh_', lower(n.n_name), '_', CAST(n.n_nationkey AS STRING)) AS holder_address,
  (CASE n.n_nationkey % 9 WHEN 0 THEN CAST(0.5 AS DOUBLE) WHEN 1 THEN CAST(5 AS DOUBLE)
        WHEN 2 THEN CAST(50 AS DOUBLE) WHEN 3 THEN CAST(500 AS DOUBLE)
        WHEN 4 THEN CAST(5000 AS DOUBLE) WHEN 5 THEN CAST(50000 AS DOUBLE)
        WHEN 6 THEN CAST(500000 AS DOUBLE) WHEN 7 THEN CAST(50000000 AS DOUBLE)
        ELSE CAST(500000000 AS DOUBLE) END) + {_MSC_DD} AS balance,
  CASE tk.safety_module_token WHEN 'stkAAVE' THEN CAST(1000000 AS DOUBLE)
       ELSE CAST(800000000 AS DOUBLE) END AS total_supply
FROM nation n
CROSS JOIN (VALUES ('stkAAVE'), ('stkABPT')) AS tk(safety_module_token)
CROSS JOIN {_MSC_DAYS}
"""

_MSC_BAL_POOL = f"""
SELECT d.block_day, p.safety_module_token, p.symbol, p.weight,
  p.balance + {_MSC_DD} AS balance
FROM (VALUES ('stkABPT', 'AAVE', CAST(0.8 AS DOUBLE), CAST(1000 AS DOUBLE)),
             ('stkABPT', 'WETH', CAST(0.2 AS DOUBLE), CAST(250 AS DOUBLE)))
  AS p(safety_module_token, symbol, weight, balance)
CROSS JOIN {_MSC_DAYS}
"""

_MSC_INC = f"""
SELECT d.block_day, CAST(100 AS BIGINT) AS block_height, 'polygon_v3' AS market,
  concat('0xr_', lower(n.n_name)) AS reserve, n.n_name AS symbol,
  CASE WHEN n.n_nationkey % 2 = 0 THEN '0xsd' ELSE '0xldo' END AS reward_token_address,
  CASE WHEN n.n_nationkey % 2 = 0 THEN 'SD' ELSE 'LDO' END AS reward_token_symbol,
  CAST(n.n_nationkey AS DOUBLE) + {_MSC_DD} AS supply_rewards,
  CAST(n.n_nationkey AS DOUBLE) * 2 AS supply_rewards_usd,
  CAST(n.n_nationkey AS DOUBLE) / 1000 AS supply_rewards_apr,
  CAST(n.n_nationkey AS DOUBLE) * 0.5 AS variable_debt_rewards,
  CAST(n.n_nationkey AS DOUBLE) AS variable_debt_rewards_usd,
  CAST(n.n_nationkey AS DOUBLE) / 2000 AS variable_borrow_rewards_apr,
  CAST(n.n_nationkey AS DOUBLE) * 0.25 AS stable_debt_rewards,
  CAST(n.n_nationkey AS DOUBLE) * 0.5 AS stable_debt_rewards_usd,
  CAST(n.n_nationkey AS DOUBLE) / 4000 AS stable_borrow_rewards_apr
FROM nation n CROSS JOIN {_MSC_DAYS}
"""

_MSC_LSD_SUPPLY = f"""
SELECT d.block_day, CAST(200 AS BIGINT) AS block_height, 'polygon' AS chain,
  p.address, p.symbol, CAST(18 AS BIGINT) AS decimals,
  p.base + {_MSC_DD} * 100 AS total_supply
FROM (VALUES ('0xmaticx', 'MaticX', CAST(1000000 AS DOUBLE)),
             ('0xstmatic', 'stMATIC', CAST(2000000 AS DOUBLE)))
  AS p(address, symbol, base)
CROSS JOIN {_MSC_DAYS}
"""

# two fetch_times: the *_latest head's scalar subquery keeps 06-02 12:00
_MSC_DEPTH = """
SELECT ft.fetch_time, 'AAVE' AS from_asset,
  CAST(90 AS DOUBLE) + CAST(extract(day FROM ft.fetch_time) AS DOUBLE) AS from_asset_price,
  CAST(g.g AS DOUBLE) * 100 AS from_amount_native,
  (CAST(90 AS DOUBLE) + CAST(extract(day FROM ft.fetch_time) AS DOUBLE)) * CAST(g.g AS DOUBLE) * 100 AS from_amount_usd,
  'USDC' AS to_asset, CAST(1 AS DOUBLE) AS to_asset_price,
  CAST(g.g AS DOUBLE) * 100 * 89 AS to_amount_native,
  CAST(g.g AS DOUBLE) * 100 * 89 AS to_amount_usd,
  CAST(g.g AS DOUBLE) * 0.0025 AS price_impact
FROM (VALUES (TIMESTAMP '2024-06-01 00:00:00'), (TIMESTAMP '2024-06-02 12:00:00')) AS ft(fetch_time)
CROSS JOIN (VALUES (1), (2), (3), (4), (5)) AS g(g)
"""

# the fantom row has no display_names match → NULL display columns
_MSC_LDEPTH = """
SELECT ft.fetch_time, p.chain, p.market, concat(p.market, '_loop') AS loop_market,
  p.from_asset, p.to_asset,
  CAST(2000 AS DOUBLE) AS from_asset_price, CAST(1999 AS DOUBLE) AS to_asset_price,
  CAST(g.g AS DOUBLE) * 50000 AS from_amount_usd,
  CAST(g.g AS DOUBLE) * 0.001 AS price_impact
FROM (VALUES ('ethereum', 'ethereum_v2', 'wstETH', 'WETH'),
             ('polygon', 'polygon_v3', 'stMATIC', 'WMATIC'),
             ('fantom', 'fantom_v3', 'sFTMX', 'WFTM'))
  AS p(chain, market, from_asset, to_asset)
CROSS JOIN (VALUES (1), (2), (3)) AS g(g)
CROSS JOIN (VALUES (TIMESTAMP '2024-06-02 12:00:00')) AS ft(fetch_time)
"""

_MSC_INPUTS = {
    "safety_module_token_hodlers_by_day": _MSC_HODL,
    "safety_module_bal_pool_contents": _MSC_BAL_POOL,
    "incentives_by_day": _MSC_INC,
    "matic_lsd_token_supply_by_day": _MSC_LSD_SUPPLY,
    "aave_token_liquidity_depth": _MSC_DEPTH,
    "liquidity_depth": _MSC_LDEPTH,
    "display_names": _TVL_NAMES,
}

_MSC_MODELS = (
    "sm_token_holders_by_day",
    "sm_token_holder_distro",
    "sm_bal_pool_contents",
    "lm_incentives",
    "token_supply_by_day",
    "aave_token_liquidity_depth_all",
    "aave_token_liquidity_depth_latest",
    "liquidity_depth_lsd",
)

_MSC_ALIGN = "\nUNION ALL\n".join(
    [
        _head_select("sm_token_holders_by_day", "sm_token_holders_by_day",
                     s=("safety_module_token",),
                     v=("CAST(token_holders AS DOUBLE)",), ns=6, nv=10),
        _head_select("sm_token_holder_distro", "sm_token_holder_distro",
                     s=("safety_module_token", "holder_bucket"),
                     v=("bucket_balance", "balance_percentage",
                        "CAST(holder_count AS DOUBLE)", "holder_percentage"),
                     ns=6, nv=10),
        _head_select("sm_bal_pool_contents", "sm_bal_pool_contents",
                     s=("safety_module_token", "symbol"),
                     v=("weight", "balance"), ns=6, nv=10),
        _head_select("lm_incentives", "lm_incentives",
                     s=("market", "reserve", "symbol", "reward_token_address",
                        "reward_token_symbol"),
                     v=("CAST(block_height AS DOUBLE)", "supply_rewards",
                        "supply_rewards_usd", "supply_rewards_apr",
                        "variable_debt_rewards", "variable_debt_rewards_usd",
                        "variable_debt_rewards_apr", "stable_debt_rewards",
                        "stable_debt_rewards_usd", "stable_debt_rewards_apr"),
                     ns=6, nv=10),
        _head_select("token_supply_by_day", "token_supply_by_day",
                     s=("chain", "address", "symbol"),
                     v=("CAST(block_height AS DOUBLE)", "CAST(decimals AS DOUBLE)",
                        "total_supply"), ns=6, nv=10),
        _head_select("aave_token_liquidity_depth_all", "aave_token_liquidity_depth_all",
                     t0="fetch_time", s=("from_asset", "to_asset"),
                     v=("from_asset_price", "from_amount_native", "from_amount_usd",
                        "to_asset_price", "to_amount_native", "to_amount_usd",
                        "price_impact"), ns=6, nv=10),
        _head_select("aave_token_liquidity_depth_latest",
                     "aave_token_liquidity_depth_latest",
                     t0="CAST(NULL AS TIMESTAMP)", s=("from_asset", "to_asset"),
                     v=("from_asset_price", "from_amount_native", "from_amount_usd",
                        "to_asset_price", "to_amount_native", "to_amount_usd",
                        "price_impact"), ns=6, nv=10),
        _head_select("liquidity_depth_lsd", "liquidity_depth_lsd",
                     t0="fetch_time",
                     s=("chain", "market", "loop_market", "from_asset",
                        "to_asset", "pair"),
                     v=("from_asset_price", "to_asset_price", "from_amount_usd",
                        "price_impact"), ns=6, nv=10),
    ]
)


def _oracle_msc() -> str:
    ctes = ",\n".join(f"{name} AS ({sql})" for name, sql in _MSC_INPUTS.items())
    model_ctes = ",\n".join(
        f"{m} AS ({_duck_dialect(MODELS[m].sql)})" for m in _MSC_MODELS
    )
    return f"""
WITH {ctes},
{model_ctes}
{_MSC_ALIGN}
"""


@register(
    "datamart_misc_heads_real",
    oracle=_oracle_msc(),
    doc=(
        "REAL datamart SQL under the driver gate (misc family, 8 models in"
        " one aligned head): sm_token_holders_by_day, sm_token_holder_distro"
        " (bucketing + max-day scalar subquery + inline-struct sort table),"
        " sm_bal_pool_contents, lm_incentives, token_supply_by_day and the"
        " three liquidity-depth models — verbatim on both engines"
    ),
)
def datamart_misc_heads_real(spark, sf_dir):
    from aave_etl_spark.plans import run_datamart

    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    inputs = {name: spark.sql(sql) for name, sql in _MSC_INPUTS.items()}
    subset = {m: MODELS[m] for m in _MSC_MODELS}
    run_datamart(spark, inputs, models=subset)
    return spark.sql(_MSC_ALIGN)


# ---------------------------------------------------------------------------
# Investment-analysis family: the four inv_* models outside the LST head,
# verbatim in one aligned slot. inv_defi_ref_stable_rate_base (aave+compound
# stable deposit earnings, LEAD end price) feeds inv_defi_ref_rates_by_day
# (ratio-of-sums + the SURVEY §2.5 RANGE-frame last_value IGNORE NULLS ffill
# citation, rewritten for DuckDB by _duck_dialect); inv_bal_performance_base
# (oracle→coingecko price fallback, coalesce-0 rate) and
# inv_treasury_atoken_performance_base (LEAD end-of-day family + receipts
# decomposition) run off shared derived lake inputs. market_state_by_time
# and aave_atokens arrive as derived input views (their own model SQL is
# certified in the market-state and misc heads).
#
# The inputs deliberately exercise: excluded-market filters (ethereum_v1
# rows), the beacon-chain day gap (ignore-nulls ffill arm), a missing
# oracle price day (NULL / coingecko-fallback arms), a missing
# liquidity_rate day (coalesce-0 arm), a zero balance (balance_native > 0
# filter), an unmapped atoken (NULL reserve join) and a date below the
# '2022-07-20' floor.
# ---------------------------------------------------------------------------
_INV_DAYS = (
    "(VALUES (TIMESTAMP '2022-07-19'), (TIMESTAMP '2022-07-20'),"
    " (TIMESTAMP '2022-07-21')) AS d(block_day)"
)

_INV_MST = f"""
SELECT d.block_day AS block_time,
  CASE WHEN n.n_nationkey % 2 = 0 THEN 'ethereum_v2' ELSE 'ethereum_v3' END AS market,
  CASE n.n_nationkey % 4 WHEN 0 THEN 'USDT' WHEN 1 THEN 'USDC' WHEN 2 THEN 'DAI'
       ELSE 'WBTC' END AS reserve_symbol,
  CAST(1000 AS DOUBLE) + CAST(n.n_nationkey AS DOUBLE) * 50
    + CAST(extract(day FROM d.block_day) AS DOUBLE) * 7 AS atoken_supply,
  CAST(0.01 AS DOUBLE) + CAST(n.n_nationkey % 7 AS DOUBLE) * 0.002 AS deposit_apy
FROM nation n CROSS JOIN {_INV_DAYS}
UNION ALL
SELECT d.block_day, 'avalanche_v3', 'USDT', CAST(99999 AS DOUBLE), CAST(0.5 AS DOUBLE)
FROM {_INV_DAYS}
"""


def _inv_compound(time_col: str, version: str, base: int) -> str:
    return f"""
SELECT d.block_day AS {time_col}, '{version}' AS compound_version,
  CASE n.n_nationkey % 3 WHEN 0 THEN 'USDT' WHEN 1 THEN 'USDC' ELSE 'DAI' END
    AS underlying_symbol,
  CAST({base} AS DOUBLE) + CAST(n.n_nationkey AS DOUBLE) * 10
    + CAST(extract(day FROM d.block_day) AS DOUBLE) AS deposits,
  CAST(0.02 AS DOUBLE) + CAST(n.n_nationkey % 5 AS DOUBLE) * 0.001 AS supply_apy
FROM nation n CROSS JOIN {_INV_DAYS} WHERE n.n_nationkey < 6
"""


_INV_CG = f"""
SELECT d.block_day, 'ethereum' AS chain,
  CASE n.n_nationkey WHEN 0 THEN 'USDT' WHEN 1 THEN 'USDC' WHEN 2 THEN 'DAI'
       ELSE 'B-80BAL-20WETH' END AS symbol,
  CASE n.n_nationkey WHEN 3 THEN '0xbpt' ELSE concat('0xcg_', lower(n.n_name)) END
    AS address,
  CAST(1 AS DOUBLE) + CAST(n.n_nationkey AS DOUBLE) * 0.01
    + CAST(extract(day FROM d.block_day) AS DOUBLE) * 0.001 AS price_usd
FROM nation n CROSS JOIN {_INV_DAYS} WHERE n.n_nationkey < 4
"""

# day-20 gap: the left join NULL is filled by the RANGE-frame ignore-nulls
_INV_BEACON = f"""
SELECT d.block_day AS partition_date,
  CAST(0.04 AS DOUBLE) + CAST(extract(day FROM d.block_day) AS DOUBLE) * 0.001 AS apr
FROM {_INV_DAYS} WHERE extract(day FROM d.block_day) <> 20
"""

_INV_PDP = f"""
SELECT d.block_day, 'ethereum_v2' AS market, 'BAL' AS symbol, '0xbal' AS reserve,
  CAST(0.001 AS DOUBLE) + CAST(extract(day FROM d.block_day) AS DOUBLE) * 0.0001
    AS liquidity_rate
FROM {_INV_DAYS} WHERE extract(day FROM d.block_day) <> 21
UNION ALL
SELECT d.block_day, 'ethereum_v1', 'BAL', '0xbal_v1', CAST(9.9 AS DOUBLE)
FROM {_INV_DAYS}
UNION ALL
SELECT d.block_day,
  CASE WHEN n.n_nationkey % 2 = 0 THEN 'ethereum_v2' ELSE 'polygon_v3' END,
  concat('a', n.n_name), concat('0xres_', lower(n.n_name)),
  CAST(0.005 AS DOUBLE) + CAST(n.n_nationkey AS DOUBLE) * 0.0005
FROM nation n CROSS JOIN {_INV_DAYS} WHERE n.n_nationkey < 6
"""

_INV_NAB = f"""
SELECT d.block_day, 'ethereum_v2' AS market, '0xbal' AS token, 'BAL' AS symbol,
  CAST(5000 AS DOUBLE) + CAST(extract(day FROM d.block_day) AS DOUBLE) * 13 AS balance
FROM {_INV_DAYS}
UNION ALL
SELECT d.block_day, 'ethereum_v2', '0xbpt', 'B-80BAL-20WETH',
  CAST(3000 AS DOUBLE) + CAST(extract(day FROM d.block_day) AS DOUBLE) * 11
FROM {_INV_DAYS}
UNION ALL
SELECT d.block_day, 'ethereum_v2', '0xxyz', 'XYZ', CAST(1 AS DOUBLE) FROM {_INV_DAYS}
UNION ALL
SELECT TIMESTAMP '2022-07-18', 'ethereum_v2', '0xbal', 'BAL', CAST(4000 AS DOUBLE)
"""

_INV_AOP = f"""
SELECT d.block_day, 'ethereum_v2' AS market, '0xbal' AS reserve, 'BAL' AS symbol,
  CAST(6 AS DOUBLE) + CAST(extract(day FROM d.block_day) AS DOUBLE) * 0.05 AS usd_price
FROM {_INV_DAYS} WHERE extract(day FROM d.block_day) <> 21
UNION ALL
SELECT d.block_day, 'ethereum_v2', '0xweth', 'WETH',
  CAST(1500 AS DOUBLE) + CAST(extract(day FROM d.block_day) AS DOUBLE)
FROM {_INV_DAYS}
UNION ALL
SELECT d.block_day,
  CASE WHEN n.n_nationkey % 2 = 0 THEN 'ethereum_v2' ELSE 'polygon_v3' END,
  concat('0xres_', lower(n.n_name)), n.n_name,
  CAST(2 AS DOUBLE) + CAST(n.n_nationkey AS DOUBLE) * 0.125
    + CAST(extract(day FROM d.block_day) AS DOUBLE) * 0.01
FROM nation n CROSS JOIN {_INV_DAYS} WHERE n.n_nationkey < 6 AND n.n_nationkey % 5 <> 3
"""

_INV_ATOKENS = """
SELECT concat('0xatk_', lower(n.n_name)) AS atoken, concat('a', n.n_name) AS atoken_symbol,
  concat('0xres_', lower(n.n_name)) AS reserve, n.n_name AS reserve_symbol,
  CASE WHEN n.n_nationkey % 2 = 0 THEN 'ethereum_v2' ELSE 'polygon_v3' END AS market
FROM nation n WHERE n.n_nationkey < 6 AND n.n_nationkey % 5 <> 4
"""

_INV_CAB = f"""
SELECT d.block_day,
  CASE WHEN n.n_nationkey % 2 = 0 THEN 'ethereum_v2' ELSE 'polygon_v3' END AS market,
  concat('0xatk_', lower(n.n_name)) AS token, concat('a', n.n_name) AS symbol,
  CASE WHEN n.n_nationkey = 5 THEN CAST(0 AS DOUBLE)
       ELSE CAST(100 AS DOUBLE) + CAST(n.n_nationkey AS DOUBLE) * 9
         + CAST(extract(day FROM d.block_day) AS DOUBLE) END AS balance
FROM nation n CROSS JOIN {_INV_DAYS} WHERE n.n_nationkey < 6
UNION ALL
SELECT d.block_day, 'ethereum_v1', '0xatk_old', 'aOLD', CAST(777 AS DOUBLE)
FROM {_INV_DAYS}
"""

_INV_BGL2 = """
SELECT CASE WHEN n.n_nationkey % 2 = 0 THEN 'ethereum_v2' ELSE 'polygon_v3' END AS market,
  concat('a', n.n_name) AS atoken_symbol,
  CASE n.n_nationkey % 3 WHEN 0 THEN 'stablecoins' WHEN 1 THEN 'eth' ELSE 'other' END
    AS balance_group,
  CASE WHEN n.n_nationkey % 3 = 0 THEN 'stable' ELSE 'volatile' END AS stable_class
FROM nation n WHERE n.n_nationkey < 4
UNION ALL
SELECT 'ethereum_v2', 'BAL', 'other', 'volatile'
UNION ALL
SELECT 'ethereum_v2', 'B-80BAL-20WETH', 'other', 'volatile'
"""

_INV4_INPUTS = {
    "market_state_by_time": _INV_MST,
    "coingecko_data_by_day": _INV_CG,
    "compound_v2_by_day": _inv_compound("block_day", "compound_v2", 500),
    "compound_v3_by_day": _inv_compound("block_day", "compound_v3", 800),
    "compound_v2_by_hour": _inv_compound("block_hour", "compound_v2", 650),
    "compound_v3_by_hour": _inv_compound("block_hour", "compound_v3", 950),
    "beacon_chain_staking_returns_by_day": _INV_BEACON,
    "protocol_data_by_day": _INV_PDP,
    "non_atoken_balances_by_day": _INV_NAB,
    "aave_oracle_prices_by_day": _INV_AOP,
    "aave_atokens": _INV_ATOKENS,
    "collector_atoken_balances_by_day": _INV_CAB,
    "balance_group_lookup": _INV_BGL2,
}

_INV4_MODELS = (
    "inv_defi_ref_stable_rate_base",
    "inv_defi_ref_rates_by_day",
    "inv_bal_performance_base",
    "inv_treasury_atoken_performance_base",
)

_INV_PERF_VALS = (
    "balance_native", "balance_usd", "balance_eth", "usd_price", "eth_price",
    "earnings_native", "earnings_usd", "earnings_eth",
    "price_change_usd", "price_change_eth",
    "receipts_native", "receipts_usd", "receipts_eth",
)

_INV4_ALIGN = "\nUNION ALL\n".join(
    [
        _head_select(
            "stable_rate_base", "inv_defi_ref_stable_rate_base",
            s=("market", "symbol"),
            v=("deposits_native", "deposit_apy", "price_usd", "end_price_usd",
               "deposits_usd", "earnings_native", "earnings_usd",
               "price_change_usd"),
            ns=4, nv=13,
        ),
        _head_select(
            "ref_rates", "inv_defi_ref_rates_by_day",
            v=("stable_reference_rate", "stable_reference_rate_ex_price",
               "eth_reference_rate"),
            ns=4, nv=13,
        ),
        _head_select(
            "bal_perf", "inv_bal_performance_base",
            s=("market", "symbol", "balance_group", "stable_class"),
            v=_INV_PERF_VALS, ns=4, nv=13,
        ),
        _head_select(
            "treasury_atoken_perf", "inv_treasury_atoken_performance_base",
            s=("market", "symbol", "balance_group", "stable_class"),
            v=_INV_PERF_VALS, ns=4, nv=13,
        ),
    ]
)


def _oracle_inv4() -> str:
    input_ctes = ",\n".join(f"{n} AS ({sql})" for n, sql in _INV4_INPUTS.items())
    model_ctes = ",\n".join(
        f"{n} AS ({_duck_dialect(MODELS[n].sql)})" for n in _INV4_MODELS
    )
    return f"""
WITH {input_ctes},
{model_ctes}
{_INV4_ALIGN}
"""


@register(
    "datamart_inv_family_real",
    oracle=_oracle_inv4(),
    doc=(
        "REAL datamart SQL under the driver gate (investment family, the 4"
        " inv_* models outside the LST head): inv_defi_ref_stable_rate_base"
        " aave+compound earnings with LEAD end price,"
        " inv_defi_ref_rates_by_day ratio-of-sums + RANGE-frame ignore-nulls"
        " ffill, inv_bal_performance_base oracle→coingecko fallback,"
        " inv_treasury_atoken_performance_base LEAD family + receipts —"
        " verbatim model SQL on both engines"
    ),
)
def datamart_inv_family_real(spark, sf_dir):
    from dataclasses import replace as dc_replace

    from aave_etl_spark.plans import run_datamart

    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    inputs = {name: spark.sql(sql) for name, sql in _INV4_INPUTS.items()}
    subset = {
        "inv_defi_ref_stable_rate_base": dc_replace(
            MODELS["inv_defi_ref_stable_rate_base"], refs=()
        ),
        "inv_defi_ref_rates_by_day": MODELS["inv_defi_ref_rates_by_day"],
        "inv_bal_performance_base": MODELS["inv_bal_performance_base"],
        "inv_treasury_atoken_performance_base": dc_replace(
            MODELS["inv_treasury_atoken_performance_base"], refs=()
        ),
    }
    run_datamart(spark, inputs, models=subset)
    return spark.sql(_INV4_ALIGN)
