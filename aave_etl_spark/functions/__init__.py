from aave_etl_spark.functions.standardise import standardise_types
from aave_etl_spark.functions.scalars import (
    RAY,
    SECONDS_PER_YEAR,
    WAD,
    apy_from_rate,
    bps_to_frac,
    from_ray,
    from_units,
    from_wad,
    safe_div,
    vested_amount,
)

__all__ = [
    "standardise_types",
    "safe_div",
    "apy_from_rate",
    "from_ray",
    "from_wad",
    "from_units",
    "bps_to_frac",
    "vested_amount",
    "RAY",
    "WAD",
    "SECONDS_PER_YEAR",
]
