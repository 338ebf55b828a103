"""Liquidity-mining incentives APR (reference
protocol_data_warehouse.py:180-318).

The reference's row-wise ``apply(apr_calc)`` + ``zip(*...)`` producing 9
columns (:249-281) is pure conditional arithmetic — here it's 9 ``F.when``
expressions, fully inside whole-stage codegen (SURVEY §2.11: "no UDF
needed — it's pure when")."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aave_etl_spark.functions.scalars import safe_div

SECONDS_IN_DAY = 86400

REWARD_MEASURES = [
    "supply_rewards_apr",
    "variable_borrow_rewards_apr",
    "stable_borrow_rewards_apr",
    "supply_rewards",
    "variable_debt_rewards",
    "stable_debt_rewards",
    "supply_rewards_usd",
    "variable_debt_rewards_usd",
    "stable_debt_rewards_usd",
]


def incentives_by_day(
    raw_incentives_by_day: DataFrame,
    protocol_data_by_day: DataFrame,
    aave_oracle_prices_by_day: DataFrame,
) -> DataFrame:
    """One row per (day, market, reserve, reward token) with emission and
    APR measures summed over a/v/s token types (:296-318)."""
    inc = raw_incentives_by_day.select(
        "block_day",
        "block_height",
        "market",
        F.col("underlying_asset").alias("reserve"),
        "token_address",
        "token_type",
        "reward_token_address",
        "reward_token_symbol",
        "reward_token_decimals",
        "emission_per_second",
        "emission_end_timestamp",
        "reward_price_feed",
        "price_feed_decimals",
    )

    # emission per day, zeroed after the program ends (:218-221)
    end_date = F.timestamp_seconds(F.col("emission_end_timestamp"))
    epd = (
        F.col("emission_per_second")
        * SECONDS_IN_DAY
        / F.pow(F.lit(10.0), F.col("reward_token_decimals").cast("double"))
    )
    inc = (
        inc.withColumn("end_date", end_date)
        .withColumn(
            "emission_per_day",
            F.when(F.col("block_day") > F.col("end_date"), F.lit(0.0)).otherwise(epd),
        )
        .withColumn(
            "emission_per_day_usd",
            F.col("emission_per_day")
            * F.col("reward_price_feed")
            / F.pow(F.lit(10.0), F.col("price_feed_decimals").cast("double")),
        )
        .drop(
            "emission_per_second",
            "emission_end_timestamp",
            "reward_price_feed",
            "price_feed_decimals",
            "reward_token_decimals",
            "end_date",
        )
        .filter(F.col("emission_per_day_usd") > 0)  # .query (:229)
    )

    protocol = protocol_data_by_day.select(
        "block_day", "block_height", "market", "reserve",
        "atoken_supply", "stable_debt", "variable_debt",
    )
    inc = inc.join(protocol, ["block_day", "block_height", "market", "reserve"], "left")
    inc = inc.join(
        aave_oracle_prices_by_day,
        ["block_day", "block_height", "market", "reserve"],
        "left",
    )

    # apr_calc (:249-281): per token_type, APR = usd emission / (supply × price) × 365
    apr = safe_div(F.col("emission_per_day_usd"), F.col("atoken_supply") * F.col("usd_price")) * 365

    def for_type(tt: str, expr):
        return F.when(F.col("token_type") == tt, expr).otherwise(F.lit(0.0))

    inc = (
        inc.withColumn("supply_rewards_apr", for_type("atoken", apr))
        .withColumn("variable_borrow_rewards_apr", for_type("vtoken", apr))
        .withColumn("stable_borrow_rewards_apr", for_type("stoken", apr))
        .withColumn("supply_rewards", for_type("atoken", F.col("emission_per_day")))
        .withColumn("variable_debt_rewards", for_type("vtoken", F.col("emission_per_day")))
        .withColumn("stable_debt_rewards", for_type("stoken", F.col("emission_per_day")))
        .withColumn("supply_rewards_usd", for_type("atoken", F.col("emission_per_day_usd")))
        .withColumn("variable_debt_rewards_usd", for_type("vtoken", F.col("emission_per_day_usd")))
        .withColumn("stable_debt_rewards_usd", for_type("stoken", F.col("emission_per_day_usd")))
    )

    return inc.groupBy(
        "block_day",
        "block_height",
        "market",
        "reserve",
        "symbol",
        "reward_token_symbol",
        "reward_token_address",
    ).agg(*[F.sum(m).alias(m) for m in REWARD_MEASURES])


def treasury_incentives_by_day(treasury_accrued_incentives_by_day: DataFrame) -> DataFrame:
    """LM rewards owed and owned by treasury contracts (reference
    aave_data/assets/financials/data_warehouse.py:417-459).

    Projection of the accrued-incentives lake table plus a ``held_rewards``
    placeholder pinned to 0.0 (the reference's "todo: join held rewards
    table when implemented"). An empty input flows through as a typed empty
    frame — no driver-side branch needed (the reference special-cases
    ``.empty`` only because pandas loses dtypes on empty selection)."""
    from aave_etl_spark.functions.standardise import standardise_types

    out = treasury_accrued_incentives_by_day.select(
        "chain",
        "market",
        "collector_contract",
        "block_day",
        "rewards_token_address",
        "rewards_token_symbol",
        "accrued_rewards",
    ).withColumn("held_rewards", F.lit(0.0))
    return standardise_types(out)
