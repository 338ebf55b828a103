"""Type/format normalization — Spark port of the reference's single schema
chokepoint ``standardise_types`` (aave_data/resources/helpers.py:663-693).

Reference semantics reproduced:

- object → nullable string            (helpers.py:681-682) → StringType
- int64  → nullable Int64             (helpers.py:683-684) → LongType
- float64 → nullable Float64          (helpers.py:685-686) → DoubleType
- naive datetime → tz-localized UTC   (helpers.py:687-688) → TimestampType
  with session tz pinned to UTC (session.py)
- any string column containing ``0x…`` values → lowercased address
  canonicalization (helpers.py:690-691) → F.lower on those columns

Spark columns are nullable by default, which is exactly why the reference
uses the pandas nullable extension dtypes — NULL-safe BigQuery semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    FloatType,
    IntegerType,
    ShortType,
    TimestampNTZType,
)


def standardise_types(df: DataFrame, address_cols: list[str] | None = None) -> DataFrame:
    """Normalize dtypes and canonicalize 0x-addresses to lowercase.

    ``address_cols``: columns to lowercase. If None, every string column is
    lowercased when it looks like an address column by name (contains
    'address', 'token', 'collector', 'reserve', 'pool', 'hash', 'sender',
    'recipient', 'contract') — a static approximation of the reference's
    value sniff ``str.startswith('0x')`` (helpers.py:690), chosen so the
    decision is plan-time (no data scan) and therefore scale-free.
    """
    out = df
    for field in df.schema.fields:
        c = field.name
        if isinstance(field.dataType, (ByteType, ShortType, IntegerType)):
            out = out.withColumn(c, F.col(c).cast("long"))
        elif isinstance(field.dataType, FloatType):
            out = out.withColumn(c, F.col(c).cast("double"))
        elif isinstance(field.dataType, TimestampNTZType):
            # naive → UTC; session tz is UTC so this is a relabel, not a shift
            out = out.withColumn(c, F.to_timestamp(c))
    if address_cols is None:
        markers = (
            "address",
            "token",
            "collector",
            "reserve",
            "pool",
            "hash",
            "sender",
            "recipient",
            "contract",
        )
        # symbol/name columns hold human-readable text, never 0x-addresses —
        # the reference's value sniff would skip them (helpers.py:690), so
        # the name heuristic must too (atoken_symbol contains "token")
        non_address = ("symbol", "name")
        address_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() == "string"
            and any(m in f.name.lower() for m in markers)
            and not any(x in f.name.lower() for x in non_address)
        ]
    for c in address_cols:
        out = out.withColumn(c, F.lower(F.col(c)))
    return out
