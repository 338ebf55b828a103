"""Liquidity-depth interpolation, paraswap fee dedup, shortfall simulation
(reference protocol_data_warehouse.py:330-420, 480-570;
data_warehouse.py:690-760).

These are the reference's only genuinely non-relational computations
(np.interp / scipy.CubicSpline per group) — the one place SURVEY §2.11
prescribes ``applyInPandas``. Everything around them (grouping, grid cross
join, monotone filter, overhang math) stays declarative."""

from __future__ import annotations

import pandas as pd
import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    StructField,
    StructType,
    TimestampType,
    StringType,
)
from pyspark.sql.window import Window

try:  # scipy is optional in this environment; gated per task instructions
    from scipy.interpolate import CubicSpline  # type: ignore

    HAVE_SCIPY = True
except Exception:  # noqa: BLE001
    CubicSpline = None
    HAVE_SCIPY = False


DEPTH_GROUP = ["market_key", "to_asset", "from_asset", "fetch_time"]

_INTERP_SCHEMA = StructType(
    [
        StructField("market_key", StringType()),
        StructField("to_asset", StringType()),
        StructField("from_asset", StringType()),
        StructField("fetch_time", TimestampType()),
        StructField("price_impact", DoubleType()),
        StructField("from_amount_usd", DoubleType()),
        StructField("to_amount_usd", DoubleType()),
        StructField("is_interpolated", BooleanType()),
    ]
)


def default_targets(start: float = 0.01, end: float = 0.05, increment: float = 0.0025) -> list[float]:
    """Target price impacts 1%..5% step 0.25% (protocol_data_warehouse.py:362-366)."""
    return [i / 10000 for i in range(int(start * 10000), int(end * 10000) + 1, int(increment * 10000))]


def liquidity_depth(
    liquidity_depth_raw: DataFrame,
    targets: list[float] | None = None,
) -> DataFrame:
    """Interpolate from_amount_usd at target price impacts per
    (market_key, to_asset, from_asset, fetch_time) group and stack onto the
    raw rows (protocol_data_warehouse.py:368-395).

    Spark shape: ``applyInPandas`` per sweep group — each group is one
    sweep (≤ ~40 points), so groups are tiny and uniform; the shuffle key
    matches the sweep key, no skew. np.interp needs its xp increasing: we
    sort by price_impact inside the group (the reference relies on the
    sweep's monotone price_impact, FIXTURES §15)."""
    tgts = targets or default_targets()

    def interp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("price_impact")
        new_from = np.interp(
            np.array(tgts), pdf["price_impact"].astype(float), pdf["from_amount_usd"].astype(float)
        )
        out = pd.DataFrame(
            {
                "market_key": pdf["market_key"].iloc[0],
                "to_asset": pdf["to_asset"].iloc[0],
                "from_asset": pdf["from_asset"].iloc[0],
                "fetch_time": pdf["fetch_time"].iloc[0],
                "price_impact": tgts,
                "from_amount_usd": new_from,
            }
        )
        # to_amount = (1 - impact) * from (reference :388)
        out["to_amount_usd"] = (1 - out["price_impact"]) * out["from_amount_usd"]
        out["is_interpolated"] = True
        return out

    interp_df = (
        liquidity_depth_raw.select(*DEPTH_GROUP, "price_impact", "from_amount_usd")
        .groupBy(*DEPTH_GROUP)
        .applyInPandas(interp, schema=_INTERP_SCHEMA)
    )

    raw = liquidity_depth_raw.withColumn("is_interpolated", F.lit(False))
    stacked = raw.unionByName(interp_df, allowMissingColumns=True)

    # forward-fill the per-group metadata onto interpolated rows
    # (reference ffills after a global sort, :406-407; the group-window form
    # is the scale-safe equivalent of the same semantic)
    fill_cols = [
        "market", "chain", "loop_market", "to_asset_address", "to_asset_decimals",
        "from_asset_address", "from_asset_decimals", "chain_id",
        "from_asset_price", "to_asset_price",
    ]
    w = (
        Window.partitionBy(*DEPTH_GROUP)
        .orderBy(F.col("is_interpolated").asc(), F.col("from_amount_usd").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in fill_cols:
        stacked = stacked.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))

    # recalc natives from the filled prices (:410-412)
    return stacked.withColumn(
        "from_amount_native", F.col("from_amount_usd") / F.col("from_asset_price")
    ).withColumn("to_amount_native", F.col("to_amount_usd") / F.col("to_asset_price"))


def paraswap_fees_dedup(
    fees: DataFrame,
    key_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Keep-last dedup + drop zeroes (data_warehouse.py:690-760).

    Reference: sort_values(...).drop_duplicates(keys, keep='last') then
    ``claimable > 0``. Spark: row_number desc over a pinned total order
    (SURVEY §7.4.3 — pandas keep='last' on ties keeps the later *input
    row*; we pin the order with the full sort column list so the choice is
    deterministic)."""
    keys = key_cols or ["block_day", "chain", "paraswap_fee_claimer", "reserve"]
    order = order_cols or ["market"]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order])
    return (
        fees.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .filter(F.col("claimable") > 0)
    )


def paraswap_legacy_claimable_fees(paraswap_legacy_fees: DataFrame) -> DataFrame:
    """Legacy-claimer twin of the fees dedup (data_warehouse.py:721-765):
    projection keeps the extra paraswap_legacy_claimer column, the
    keep-last key adds it, zeroes dropped AFTER dedup (a zero row that
    wins keep-last removes its key entirely — pandas semantics)."""
    fees = paraswap_legacy_fees.select(
        "block_day", "chain", "market", "paraswap_fee_claimer",
        "paraswap_legacy_claimer", "reserve", "symbol", "claimable",
    )
    # order pinned past `market` so two rows sharing the full key AND
    # market still pick a deterministic winner on both engines
    return paraswap_fees_dedup(
        fees,
        key_cols=["block_day", "chain", "paraswap_fee_claimer",
                  "paraswap_legacy_claimer", "reserve"],
        order_cols=["market", "symbol", "claimable"],
    )


_SPLINE_SCHEMA = StructType(
    [
        StructField("block_day", TimestampType()),
        StructField("staked_value_usd", DoubleType()),
        StructField("sm_coverage", DoubleType()),
        StructField("max_cap", DoubleType()),
        StructField("bad_debt", DoubleType()),
        StructField("naive_sales", DoubleType()),
        StructField("sale_required_for_bad_debt", DoubleType()),
        StructField("aave_sold_usd", DoubleType()),
        StructField("aave_price_impact", DoubleType()),
        StructField("overhang", DoubleType()),
    ]
)


def shortfall_simulation(
    aave_token_liquidity_depth: DataFrame,
    sm_staked_value_by_day: DataFrame,
) -> DataFrame:
    """Bad-debt sweep over fitted liquidity curves
    (protocol_data_warehouse.py:480-570).

    Per-day pipeline, all declarative except the curve fit:
    1. first-fetch-of-day pick (min fetch_time window + filter, :516-518);
    2. monotone filter via lag diff >= 0 (:528-533);
    3. per-day curve fit + bad-debt sweep in ``applyInPandas`` —
       scipy.CubicSpline when available (reference :537-541), else
       monotone linear interpolation (np.interp) as the documented
       fallback (this container has no scipy; the spline is the only
       scipy use in the reference).
    """
    liq = aave_token_liquidity_depth.withColumn(
        "block_day", F.date_trunc("DAY", F.col("fetch_time"))
    )
    w_day = Window.partitionBy("block_day")
    liq = (
        liq.withColumn("min_fetch", F.min("fetch_time").over(w_day))
        .filter(F.col("fetch_time") == F.col("min_fetch"))
        .select("block_day", "from_amount_usd", "to_amount_usd", "price_impact")
    )
    liq = liq.withColumn(
        "to_amount_aaveweth",
        F.col("from_amount_usd") * (1 - F.col("price_impact")) * 0.9
        + F.col("from_amount_usd") * 0.1,
    )
    # monotone filter (:528-533)
    w_ord = Window.partitionBy("block_day").orderBy("from_amount_usd")
    liq = (
        liq.withColumn("prev", F.coalesce(F.lag("to_amount_aaveweth").over(w_ord), F.lit(0.0)))
        .filter(F.col("to_amount_aaveweth") - F.col("prev") >= 0)
        .drop("prev")
    )

    sm = sm_staked_value_by_day.groupBy("block_day").agg(
        F.sum("staked_value_usd").alias("staked_value_usd")
    ).withColumn("sm_coverage", F.col("staked_value_usd") * 0.3)

    joined = liq.join(sm, "block_day", "left")

    bad_debt_range = [*[10**6 * i for i in range(1, 100)], *[10**8 * i for i in range(1, 6)]]

    def simulate(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("from_amount_usd")
        x = pdf["from_amount_usd"].astype(float).to_numpy()
        y = pdf["to_amount_aaveweth"].astype(float).to_numpy()
        imp = pdf["price_impact"].astype(float).to_numpy()
        if HAVE_SCIPY and len(x) >= 2:
            from_given_to = CubicSpline(x, y)
            to_given_from = CubicSpline(y, x)
            impact_given_aave = CubicSpline(x, imp)
        else:  # linear fallback
            from_given_to = lambda v: np.interp(v, x, y)  # noqa: E731
            to_given_from = lambda v: np.interp(v, y, x)  # noqa: E731
            impact_given_aave = lambda v: np.interp(v, x, imp)  # noqa: E731
        cov = float(pdf["sm_coverage"].iloc[0] or 0.0)
        max_cap = float(from_given_to(cov))
        bd = np.array(bad_debt_range, dtype=float)
        out = pd.DataFrame(
            {
                "block_day": pdf["block_day"].iloc[0],
                "staked_value_usd": float(pdf["staked_value_usd"].iloc[0] or 0.0),
                "sm_coverage": cov,
                "max_cap": max_cap,
                "bad_debt": bd,
                "naive_sales": np.asarray(from_given_to(bd), dtype=float),
                "sale_required_for_bad_debt": np.asarray(to_given_from(bd), dtype=float),
                "aave_sold_usd": bd * 0.9,
            }
        )
        out["aave_price_impact"] = np.asarray(impact_given_aave(out["aave_sold_usd"]), dtype=float)
        out["overhang"] = np.where(out["bad_debt"] < max_cap, 0.0, out["bad_debt"] - max_cap)
        return out

    return joined.groupBy("block_day").applyInPandas(simulate, schema=_SPLINE_SCHEMA)
