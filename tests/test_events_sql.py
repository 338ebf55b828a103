"""Re-homed Flipside-SQL tests with synthetic decoded-log events
(reference data_lake.py:1308-1362, 1616-1721)."""

from __future__ import annotations

import json
from datetime import datetime

import pytest

from aave_etl_spark.warehouse import events_sql as es

EV_SCHEMA = (
    "block_timestamp timestamp, block_number long, contract_address string,"
    "event_name string, decoded_log string, tx_hash string"
)


def _ev(ts, block, addr, name, log, tx="0xt"):
    return (ts, block, addr, name, json.dumps(log), tx)


def test_user_lm_rewards_claimed(spark):
    t = datetime(2022, 6, 1, 10)
    events = spark.createDataFrame(
        [
            _ev(t, 100, es.INCENTIVES_CONTROLLER, "RewardsClaimed", {"amount": 2e18}),
            _ev(t, 101, es.STK_AAVE, "RewardsClaimed", {"amount": 3e18}),
            _ev(t, 102, es.BALANCER_POOL, "RewardsClaimed", {"amount": 5e18}),
            # outside the block range → excluded
            _ev(t, 999, es.STK_AAVE, "RewardsClaimed", {"amount": 7e18}),
            # different event → excluded
            _ev(t, 103, es.STK_AAVE, "Transfer", {"amount": 9e18}),
        ],
        EV_SCHEMA,
    )
    out = es.user_lm_rewards_claimed(events, "2022-06-01", "ethereum_v2", 100, 200)
    rows = {r.reward_vault: r for r in out.collect()}
    # stkAAVE + balancer both pay from the ecosystem reserve (data_lake.py:1318-1322)
    eco = rows["ecosystem_reserve"]
    assert eco.vault_address == es.ECOSYSTEM_RESERVE
    assert eco.sm_stkAAVE_claims == pytest.approx(3.0)
    assert eco.sm_stkABPT_claims == pytest.approx(5.0)
    assert eco.lm_aave_v2_claims == 0.0
    inc = rows["incentives_controller"]
    assert inc.vault_address == es.INCENTIVES_CONTROLLER
    assert inc.lm_aave_v2_claims == pytest.approx(2.0)
    assert inc.token_address == es.AAVE_TOKEN

    enriched = es.user_rewards_by_day(out).first()
    assert enriched.sm_stkAAVE_owed == 0.0  # data_warehouse.py:392-394


def test_streaming_payments_state_vesting(spark):
    t = datetime(2022, 6, 1, 10)
    start_s = 1_654_000_000
    stop_s = start_s + 100_000
    events = spark.createDataFrame(
        [
            _ev(t, 10, es.ECOSYSTEM_RESERVE, "CreateStream", {
                "deposit": 100_000 * 10**18, "recipient": "0xr", "sender": "0xs",
                "startTime": start_s, "stopTime": stop_s, "streamId": 1,
                "tokenAddress": es.AAVE_TOKEN,
            }),
            _ev(t, 20, es.ECOSYSTEM_RESERVE, "WithdrawFromStream",
                {"streamId": 1, "amount": 10_000 * 10**18}),
            _ev(t, 21, es.ECOSYSTEM_RESERVE, "WithdrawFromStream",
                {"streamId": 1, "amount": 5_000 * 10**18}),
        ],
        EV_SCHEMA,
    )
    tokens = spark.createDataFrame(
        [(es.AAVE_TOKEN, "AAVE", 18)], "address string, symbol string, decimals long"
    )
    # as-of halfway through the stream
    now = start_s + 50_000
    out = es.streaming_payments_state(events, tokens, end_block=100, current_time_s=now)
    r = out.first()
    assert r.deposit == pytest.approx(100_000.0)
    assert r.stream_rate == pytest.approx(1.0)  # deposit/(stop-start) = 1/s
    assert r.claims == pytest.approx(15_000.0)  # two withdrawals summed
    assert r.vested == pytest.approx(50_000.0)  # clamp(min(now,stop)-start) × rate
    assert r.unvested == pytest.approx(50_000.0)
    assert r.unclaimed == pytest.approx(35_000.0)
    assert r.symbol == "AAVE"

    # as-of after the stream ends → fully vested (the min(now, stop) clamp)
    done = es.streaming_payments_state(events, tokens, 100, stop_s + 999_999).first()
    assert done.vested == pytest.approx(100_000.0)
    assert done.unvested == pytest.approx(0.0)
