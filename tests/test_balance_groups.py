"""balance_group_lookup golden tests (reference data_warehouse.py:620-663)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aave_etl_spark.warehouse.balance_groups import balance_group_lookup


def test_balance_group_assignment(spark):
    tokens = spark.createDataFrame(
        [
            ("ethereum_v2", "0xausdc", "aUSDC", "0xusdc", "USDC", "0xpool", 1, None),
            ("ethereum_v1", "0xadai", "aDAI", "0xdai", "DAI", "0xpool", 1, None),
        ],
        "market string, atoken string, atoken_symbol string, reserve string, symbol string, pool string, block_height long, block_day timestamp",
    )
    non_atokens = spark.createDataFrame(
        [(None, "e", "ethereum_v2", "0xaave", "AAVE", 1.0, 0.0, 0.0, 0.0, 0.0, 0.0)],
        "block_day timestamp, chain string, market string, contract_address string, token string,"
        "balance double, tokens_in_external double, tokens_in_internal double,"
        "tokens_out_external double, tokens_out_internal double, paraswap_fees_claimable double",
    ).withColumnRenamed("contract_address", "_ca").withColumn("symbol", F.lit("AAVE")).withColumnRenamed("_ca", "contract_address")
    eth_bal = spark.createDataFrame(
        [(1, None, "ethereum", "ethereum_v2", "0xc", "0xweth", "ETH", 1.0)],
        "block_height long, block_day timestamp, chain string, market string, collector string,"
        "wrapped_gas_token string, gas_token string, balance double",
    )
    mc = spark.createDataFrame(
        [("ethereum_v2", "ethereum"), ("ethereum_v1", "ethereum")], "market string, chain string"
    )
    groups = {
        "USDC": ["aUSDC"],
        "DAI": ["aDAI"],
        "other_stables": ["aUSDP"],
        "AAVE": ["AAVE"],
    }
    out = balance_group_lookup(tokens, non_atokens, eth_bal, groups, mc)
    rows = {r.atoken_symbol: r for r in out.collect()}

    assert rows["aUSDC"].balance_group == "USDC"
    assert rows["aUSDC"].stable_class == "stablecoin"
    assert rows["AAVE"].balance_group == "AAVE"
    assert rows["AAVE"].stable_class == "unstablecoin"
    # unmatched symbols default to Other Token (:660)
    assert rows["ETH"].balance_group == "Other Token"
    # v1 tokens also appear keyed by their native reserve (:631-633)
    v1_native = out.filter((F.col("market") == "ethereum_v1") & (F.col("atoken") == "0xdai"))
    assert v1_native.count() == 1


def test_other_stables_renamed(spark):
    tokens = spark.createDataFrame(
        [("ethereum_v2", "0xausdp", "aUSDP", "0xusdp", "USDP", "0xp", 1, None)],
        "market string, atoken string, atoken_symbol string, reserve string, symbol string, pool string, block_height long, block_day timestamp",
    )
    empty_non = spark.createDataFrame(
        [], "block_day timestamp, chain string, market string, contract_address string, token string, symbol string,"
            "balance double, tokens_in_external double, tokens_in_internal double,"
            "tokens_out_external double, tokens_out_internal double, paraswap_fees_claimable double")
    empty_eth = spark.createDataFrame(
        [], "block_height long, block_day timestamp, chain string, market string, collector string,"
            "wrapped_gas_token string, gas_token string, balance double")
    mc = spark.createDataFrame([("ethereum_v2", "ethereum")], "market string, chain string")
    out = balance_group_lookup(tokens, empty_non, empty_eth, {"other_stables": ["aUSDP"]}, mc).first()
    # display rename after stable_class derivation (:661)
    assert out.balance_group == "Other Stables"
    assert out.stable_class == "stablecoin"
