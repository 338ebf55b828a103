"""Measure-join transforms (reference:
aave_data/assets/financials/data_warehouse.py:84-227 atoken,
:236-335 non-atoken).

Spark shape: the balances fact is the driving table; the market→chain dim
and the internal-address classification dim are broadcast; transfers are
classified (IN joins on from_address, OUT on to_address — :153-164),
quadrant-split with conditional sums (:171-179), aggregated with one
shuffle on the day key, then left-joined back. ``fillna(0)`` runs after all
joins, matching the reference's fill order exactly (:210; SURVEY §7.4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _strip_prefix(df: DataFrame, prefix: str = "transfers_") -> DataFrame:
    """transfers.columns.str.replace('transfers_','') (data_warehouse.py:135)."""
    return df.toDF(*[c.removeprefix(prefix) for c in df.columns])


def classify_transfers(
    transfers: DataFrame,
    internal_addresses: DataFrame,
    market_chain: DataFrame,
) -> DataFrame:
    """Classify transfers internal/external and quadrant-split.

    Reference data_warehouse.py:135-179: strip the transfers_ prefix, join
    chain, split IN/OUT, left-join the classification dim on the
    *counterparty* address (from for IN, to for OUT), default
    'aave_external', then conditional-sum into the four quadrant columns.
    Output grain: one row per transfer with quadrant columns (caller
    aggregates)."""
    tr = _strip_prefix(transfers).join(F.broadcast(market_chain), "market", "left")
    cls = internal_addresses.select("chain", "contract_address", "internal_external")

    t_in = tr.filter(F.col("transfer_type") == "IN").join(
        F.broadcast(cls.withColumnRenamed("contract_address", "from_address")),
        ["chain", "from_address"],
        "left",
    )
    t_out = tr.filter(F.col("transfer_type") == "OUT").join(
        F.broadcast(cls.withColumnRenamed("contract_address", "to_address")),
        ["chain", "to_address"],
        "left",
    )
    both = t_in.unionByName(t_out, allowMissingColumns=True).withColumn(
        "internal_external", F.coalesce(F.col("internal_external"), F.lit("aave_external"))
    )

    def quadrant(cls_val: str, direction: str):
        return F.when(
            (F.col("internal_external") == cls_val) & (F.col("transfer_type") == direction),
            F.col("amount_transferred"),
        ).otherwise(F.lit(0.0))

    return (
        both.withColumn("tokens_in_external", quadrant("aave_external", "IN"))
        .withColumn("tokens_in_internal", quadrant("aave_internal", "IN"))
        .withColumn("tokens_out_external", quadrant("aave_external", "OUT"))
        .withColumn("tokens_out_internal", quadrant("aave_internal", "OUT"))
    )


QUADRANTS = [
    "tokens_in_external",
    "tokens_in_internal",
    "tokens_out_external",
    "tokens_out_internal",
]


def atoken_measures_by_day(
    collector_atoken_balances_by_day: DataFrame,
    collector_atoken_transfers_by_day: DataFrame,
    v3_accrued_fees_by_day: DataFrame,
    v3_minted_to_treasury_by_day: DataFrame,
    aave_internal_addresses: DataFrame,
    market_chain: DataFrame,
) -> DataFrame:
    """One row per (collector, atoken, day) with every measure joined;
    missing measures 0 (data_warehouse.py:84-227).

    market_chain: tiny (market, chain) dim built from config
    (data_warehouse.py:109-112) — broadcast everywhere."""
    out = collector_atoken_balances_by_day.join(
        F.broadcast(market_chain), "market", "left"
    )

    fees = v3_accrued_fees_by_day.select(
        "market",
        F.col("atoken").alias("token"),
        F.col("atoken_symbol").alias("symbol"),
        "block_height",
        "block_day",
        "accrued_fees",
    )
    # pandas merge(how='left') with no `on` joins on all shared columns
    out = out.join(fees, ["market", "token", "symbol", "block_height", "block_day"], "left")

    transfers = classify_transfers(
        collector_atoken_transfers_by_day, aave_internal_addresses, market_chain
    )
    transfers_agg = (
        transfers.withColumnsRenamed({"contract_address": "token", "contract_symbol": "symbol"})
        .groupBy("market", "chain", "collector", "token", "symbol", "block_day")
        .agg(*[F.sum(q).alias(q) for q in QUADRANTS])
    )
    out = out.join(
        transfers_agg, ["market", "chain", "collector", "token", "symbol", "block_day"], "left"
    )

    minted = v3_minted_to_treasury_by_day.select(
        "market",
        F.col("atoken").alias("token"),
        "block_day",
        "minted_to_treasury_amount",
        "minted_amount",
    )
    out = out.join(minted, ["market", "token", "block_day"], "left")

    # eth_v1 ETH symbol fixup (data_warehouse.py:208)
    out = out.withColumn(
        "symbol",
        F.when(
            (F.col("market") == "ethereum_v1") & (F.col("symbol") == "ETH"), F.lit("WETH")
        ).otherwise(F.col("symbol")),
    )
    # fillna(0) AFTER all joins (:210; SURVEY §7.4.2)
    return out.na.fill(
        0.0,
        ["accrued_fees", *QUADRANTS, "minted_to_treasury_amount", "minted_amount"],
    )


def non_atoken_measures_by_day(
    non_atoken_balances_by_day: DataFrame,
    non_atoken_transfers_by_day: DataFrame,
    aave_internal_addresses: DataFrame,
    paraswap_fees: DataFrame,
    market_chain: DataFrame,
) -> DataFrame:
    """Non-atoken variant (data_warehouse.py:236-335): transfers keyed by
    holder contract_address; paraswap claimable fees stacked in via
    union+re-aggregate (:321-331) rather than a join."""
    # balances already carry chain; pandas merge(how='left') with no `on`
    # joins on ALL shared columns = (market, chain) (data_warehouse.py:271)
    out = non_atoken_balances_by_day.drop("block_height", "decimals").join(
        F.broadcast(market_chain), ["market", "chain"], "left"
    )

    transfers = classify_transfers(
        non_atoken_transfers_by_day, aave_internal_addresses, market_chain
    )
    # ordered renames: contract_address→token must happen BEFORE
    # collector→contract_address or the rename map collides and every
    # post-collision 'contract_address' (old + new) becomes 'token'
    transfers_agg = (
        transfers.withColumnRenamed("contract_address", "token")
        .withColumnRenamed("collector", "contract_address")
        .groupBy("market", "chain", "contract_address", "token", "block_day")
        .agg(*[F.sum(q).alias(q) for q in QUADRANTS])
    )
    out = out.join(
        transfers_agg, ["market", "chain", "contract_address", "token", "block_day"], "left"
    )

    fees = paraswap_fees.select(
        "block_day",
        "chain",
        "market",
        F.col("paraswap_fee_claimer").alias("contract_address"),
        F.col("reserve").alias("token"),
        "symbol",
        F.col("claimable").alias("paraswap_fees_claimable"),
    )
    # concat + fillna + groupby-sum (:321-331)
    stacked = out.unionByName(fees, allowMissingColumns=True).na.fill(
        0.0, ["balance", *QUADRANTS, "paraswap_fees_claimable"]
    )
    measure_cols = ["balance", *QUADRANTS, "paraswap_fees_claimable"]
    return stacked.groupBy(
        "block_day", "chain", "market", "contract_address", "token", "symbol"
    ).agg(*[F.sum(c).alias(c) for c in measure_cols])
