"""Domain scalar math as Column expressions — all JVM-side (whole-stage
codegen), no Python UDFs.

Reference parity:

- decimal shifts raw/10**decimals   (helpers.py:229, 236, 535)
- ray /1e27, wad /1e18, bps /1e4     (helpers.py:758-761, 789-795)
- APY compounding pow(1+r/n, n)-1    (protocol_data_warehouse.py:120-122;
                                      aave_dbt/models/datamart/market_state_by_hour.sql:22-25)
- safe division                      (protocol_data_warehouse.py:196-198)
- stream vesting clamp               (assets/financials/data_lake.py:1701-1712)

The reference deliberately computes in float64 ("int64 not big enough",
helpers.py:229) — we keep double semantics for parity; do NOT "upgrade" to
DecimalType (SURVEY.md §7.4.1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RAY = 10**27
WAD = 10**18
SECONDS_PER_YEAR = 31_536_000


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def from_units(raw: Column | str, decimals: Column | str) -> Column:
    """uint256 token amount → float units: raw / 10**decimals."""
    return _c(raw).cast("double") / F.pow(F.lit(10.0), _c(decimals).cast("double"))


def from_ray(raw: Column | str) -> Column:
    """Aave ray-scaled rate/index → float (/1e27, helpers.py:789-795)."""
    return _c(raw).cast("double") / F.lit(float(RAY))


def from_wad(raw: Column | str) -> Column:
    """wei → ether (/1e18, data_lake.py:1950)."""
    return _c(raw).cast("double") / F.lit(float(WAD))


def bps_to_frac(raw: Column | str) -> Column:
    """basis points → fraction (/1e4, helpers.py:758-761)."""
    return _c(raw).cast("double") / F.lit(1e4)


def safe_div(num: Column | str, den: Column | str, default: float = 0.0) -> Column:
    """x/y with 0-denominator guard (protocol_data_warehouse.py:196-198)."""
    den_c = _c(den)
    return F.when(den_c != 0, _c(num) / den_c).otherwise(F.lit(default))


def apy_from_rate(rate: Column | str, periods: int = SECONDS_PER_YEAR) -> Column:
    """Compounded APY: (1 + rate/periods)**periods - 1
    (market_state_by_hour.sql:22-25; protocol_data_warehouse.py:120-122)."""
    p = F.lit(float(periods))
    return F.pow(F.lit(1.0) + _c(rate) / p, p) - F.lit(1.0)


def vested_amount(
    now_s: Column | str,
    start_s: Column | str,
    stop_s: Column | str,
    rate_per_s: Column | str,
) -> Column:
    """Stream vesting: clamp(min(now, stop) - start, >=0) * rate
    (data_lake.py:1709-1712)."""
    elapsed = F.least(_c(now_s), _c(stop_s)) - _c(start_s)
    return F.greatest(elapsed, F.lit(0)).cast("double") * _c(rate_per_s)
