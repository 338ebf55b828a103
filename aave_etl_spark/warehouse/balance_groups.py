"""Balance-group token classification (reference data_warehouse.py:620-663).

Builds the token dim (atokens + v1 native + non-atokens + gas tokens),
then assigns each token a balance group by membership in the configured
per-group symbol lists, defaulting 'Other Token'; stable_class from the
stable groups. The reference's np.where-isin loop over wide-table columns
becomes one chained F.when over broadcast membership — plan-time, no
shuffle beyond the unions' distinct."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STABLE_GROUPS = ("DAI", "USDC", "USDT", "other_stables")


def balance_group_lookup(
    market_tokens_by_day: DataFrame,
    non_atoken_measures_by_day: DataFrame,
    eth_balances_by_day: DataFrame,
    balance_group_lists: dict[str, list[str]],
    market_chain: DataFrame,
) -> DataFrame:
    """balance_group_lists: group name → member atoken_symbols (the
    reference's wide CSV table, one column per group, :653-656)."""
    tokens = market_tokens_by_day.select(
        "market", "atoken", "atoken_symbol", "reserve", "symbol"
    ).distinct()

    # v1 tokens held as native reserves (:631-633)
    v1 = tokens.filter(F.col("market") == "ethereum_v1").withColumn(
        "atoken", F.col("reserve")
    )
    out = tokens.unionByName(v1)

    non_atokens = (
        non_atoken_measures_by_day.select(
            "market", F.col("token").alias("reserve"), "symbol"
        )
        .distinct()
        .withColumn("atoken", F.col("reserve"))
        .withColumn("atoken_symbol", F.col("symbol"))
    )
    out = out.unionByName(non_atokens)

    gas = (
        eth_balances_by_day.select(
            "market",
            F.col("wrapped_gas_token").alias("atoken"),
            F.col("gas_token").alias("atoken_symbol"),
        )
        .distinct()
        .withColumn("reserve", F.col("atoken"))
        .withColumn("symbol", F.col("atoken_symbol"))
    )
    out = out.unionByName(gas)

    out = out.join(F.broadcast(market_chain), "market", "left")

    group_expr = F.lit(None).cast("string")
    # the reference's sequential np.where loop overwrites, so the LAST
    # matching group wins. Each iteration WRAPS the previous expression as
    # its otherwise-branch, making the latest group the outermost (first-
    # evaluated) check — so iterate in CONFIG ORDER to give later groups
    # priority (iterating reversed would flip this to first-match-wins,
    # the round-6 parity bug this comment replaces)
    for group, symbols in balance_group_lists.items():
        group_expr = F.when(F.col("atoken_symbol").isin(symbols), F.lit(group)).otherwise(group_expr)
    out = out.withColumn("balance_group", F.coalesce(group_expr, F.lit("Other Token")))
    out = out.withColumn(
        "stable_class",
        F.when(F.col("balance_group").isin(list(STABLE_GROUPS)), "stablecoin").otherwise(
            "unstablecoin"
        ),
    ).withColumn(
        "balance_group",
        F.when(F.col("balance_group") == "other_stables", "Other Stables").otherwise(
            F.col("balance_group")
        ),
    )
    return out.select(
        "market", "atoken", "atoken_symbol", "reserve", "symbol", "chain",
        "balance_group", "stable_class",
    )
