"""Re-homed remote-SQL scans (SURVEY §3 entry point 3, §7.2 step 5).

The reference pushes SQL out to Flipside over decoded event-log tables
(data_lake.py:1308-1362 RewardsClaimed; :1616-1684 CreateStream /
WithdrawFromStream) and post-processes in pandas (:1697-1721). Here the
table comes in: the same queries run as Spark SQL over a decoded-events
DataFrame (FIXTURES §14 schema: block_timestamp, block_number,
contract_address, event_name, decoded_log JSON string, tx_hash), and the
vesting math is JVM-side column arithmetic.

At scale the events table is the 100 TB object: every filter here
(event_name, contract_address, block range) is a plain predicate that
pushes to the parquet scan, and the aggregations are single-shuffle
group-bys on bounded keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aave_etl_spark.functions.scalars import vested_amount

INCENTIVES_CONTROLLER = "0xd784927ff2f95ba542bfc824c8a8a98f3495f6b5"
BALANCER_POOL = "0xa1116930326d21fb917d5a27f1e9943a9595fb47"
STK_AAVE = "0x4da27a545c0c5b758a6ba100e3a049001de870f5"
ECOSYSTEM_RESERVE = "0x25f2226b597e8f9514b3f68f00f494cf4f286491"
AAVE_TOKEN = "0x7fc66500c84a76ad7e9c93437bfc5ac33e2ddae9"
STREAM_CONTRACTS = (ECOSYSTEM_RESERVE, "0x464c71f6c2f760dda6093dcb91c24c39e5d6e18c")


def _json_field(col: str, path: str):
    """decoded_log:field (Snowflake JSON path) → get_json_object."""
    return F.get_json_object(F.col(col), f"$.{path}")


def user_lm_rewards_claimed(
    events: DataFrame,
    block_day: str,
    market: str,
    start_block: int,
    end_block: int,
) -> DataFrame:
    """RewardsClaimed rollup per reward vault (data_lake.py:1308-1362).

    Conditional-sum pivot of claim amounts by source contract, re-keyed to
    the paying vault; amounts wei→AAVE (/1e18)."""
    claims = (
        events.filter(
            (F.col("event_name") == "RewardsClaimed")
            & (F.col("block_number") >= start_block)
            & (F.col("block_number") < end_block)
            & F.col("contract_address").isin(INCENTIVES_CONTROLLER, BALANCER_POOL, STK_AAVE)
        )
        .groupBy("contract_address")
        .agg((F.sum(_json_field("decoded_log", "amount").cast("double")) / 1e18).alias("amount"))
    )
    staged = claims.select(
        F.when(F.col("contract_address") == INCENTIVES_CONTROLLER, "incentives_controller")
        .otherwise("ecosystem_reserve")
        .alias("reward_vault"),
        F.when(F.col("contract_address") == BALANCER_POOL, F.col("amount")).otherwise(0.0).alias("balancer_claims"),
        F.when(F.col("contract_address") == INCENTIVES_CONTROLLER, F.col("amount")).otherwise(0.0).alias("incentives_claims"),
        F.when(F.col("contract_address") == STK_AAVE, F.col("amount")).otherwise(0.0).alias("stkaave_claims"),
    )
    return staged.groupBy("reward_vault").agg(
        F.sum("stkaave_claims").alias("sm_stkAAVE_claims"),
        F.sum("balancer_claims").alias("sm_stkABPT_claims"),
        F.sum("incentives_claims").alias("lm_aave_v2_claims"),
    ).select(
        F.lit(block_day).cast("timestamp").alias("block_day"),
        F.lit("ethereum").alias("chain"),
        F.lit(market).alias("market"),
        F.when(F.col("reward_vault") == "incentives_controller", INCENTIVES_CONTROLLER)
        .otherwise(ECOSYSTEM_RESERVE)
        .alias("vault_address"),
        "reward_vault",
        F.lit(AAVE_TOKEN).alias("token_address"),
        "sm_stkAAVE_claims",
        "sm_stkABPT_claims",
        "lm_aave_v2_claims",
    )


def user_rewards_by_day(user_lm_rewards_claimed_df: DataFrame) -> DataFrame:
    """Adds the not-yet-implemented owed columns as zeros
    (data_warehouse.py:371-406)."""
    return (
        user_lm_rewards_claimed_df.withColumn("sm_stkAAVE_owed", F.lit(0.0))
        .withColumn("sm_stkABPT_owed", F.lit(0.0))
        .withColumn("lm_aave_v2_owed", F.lit(0.0))
    )


def streaming_payments_state(
    events: DataFrame,
    tokens: DataFrame,
    end_block: int,
    current_time_s: float,
) -> DataFrame:
    """Stream ledger state: CreateStream × WithdrawFromStream × token dim
    with vesting clamp (data_lake.py:1616-1684 SQL + :1697-1721 pandas).

    tokens: (address, symbol, decimals) dim — broadcast.
    current_time_s: epoch seconds of (max block_day + 1 day), the
    reference's as-of point (:1707)."""
    base = events.filter(
        F.col("contract_address").isin(*STREAM_CONTRACTS)
        & (F.col("block_timestamp") > F.lit("2022-05-06").cast("timestamp"))
        & (F.col("block_number") <= end_block)
    )
    creates = base.filter(F.col("event_name") == "CreateStream").select(
        F.date_trunc("DAY", F.col("block_timestamp")).alias("deposit_day"),
        "contract_address",
        _json_field("decoded_log", "deposit").cast("double").alias("deposit_raw"),
        _json_field("decoded_log", "recipient").alias("recipient"),
        _json_field("decoded_log", "sender").alias("sender"),
        _json_field("decoded_log", "startTime").cast("long").alias("start_time_s"),
        _json_field("decoded_log", "stopTime").cast("long").alias("stop_time_s"),
        _json_field("decoded_log", "streamId").cast("long").alias("stream_id"),
        _json_field("decoded_log", "tokenAddress").alias("token_address"),
    ).withColumn(
        "stream_rate_raw",
        F.col("deposit_raw") / (F.col("stop_time_s") - F.col("start_time_s")),
    )
    withdraws = (
        base.filter(F.col("event_name") == "WithdrawFromStream")
        .groupBy(
            "contract_address",
            _json_field("decoded_log", "streamId").cast("long").alias("stream_id"),
        )
        .agg(F.sum(_json_field("decoded_log", "amount").cast("double")).alias("claims_raw"))
    )
    joined = (
        creates.join(withdraws, ["contract_address", "stream_id"], "left")
        .join(F.broadcast(tokens), creates.token_address == tokens.address, "left")
        .na.fill(0.0, ["claims_raw"])
    )
    unit = F.pow(F.lit(10.0), F.col("decimals").cast("double"))
    now = F.lit(float(current_time_s))
    out = (
        joined.withColumn("start_time", F.timestamp_seconds(F.col("start_time_s")))
        .withColumn("stop_time", F.timestamp_seconds(F.col("stop_time_s")))
        .withColumn("deposit", F.col("deposit_raw") / unit)
        .withColumn("claims", F.col("claims_raw") / unit)
        .withColumn("stream_rate", F.col("stream_rate_raw") / unit)
        .withColumn(
            "vested",
            vested_amount(now, F.col("start_time_s"), F.col("stop_time_s"), F.col("stream_rate")),
        )
        .withColumn("unvested", F.col("deposit") - F.col("vested"))
        .withColumn("unclaimed", F.col("vested") - F.col("claims"))
    )
    return out.select(
        "deposit_day", "contract_address", "recipient", "sender", "token_address",
        "stream_id", "start_time_s", "stop_time_s", "start_time", "stop_time",
        "stream_rate", "symbol", "decimals",
        "deposit", "claims", "vested", "unvested", "unclaimed",
    )
