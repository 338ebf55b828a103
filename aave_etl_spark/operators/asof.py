"""As-of (point-in-time) join — the custom temporal operator Spark's
join syntax lacks.

For each left row, attach the latest right row with ts <= left.ts for the
same key (the "last quote at-or-before the trade" join). A naive SQL form
is a range join (`r.ts <= l.ts` + per-row max), which Catalyst executes as
a broadcast-nested-loop or a shuffle with per-key quadratic probing —
O(|L|·|R|) inside hot keys. This implementation is the sort-merge as-of:

    union both sides tagged → one shuffle on the key → per-key sort by
    (ts, side) → last_value(... IGNORE NULLS) carries the right payload
    forward → keep left rows.

Cost: ONE exchange on the join key and one sort — the same shape as any
windowed aggregation, linear in |L|+|R|, skew-tolerant via AQE. Right
rows sort before left rows at equal ts, so the match is inclusive
(ts_right == ts_left counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row + `asof_<c>` for each right value
    column, from the latest right row at-or-before the left row's ts with
    equal keys (NULL when no prior right row exists).

    All value columns travel as ONE struct through a single
    ``last(ignorenulls=True)``: every ``asof_<c>`` comes from the SAME
    right row, and a NULL field in that row stays NULL (per-column last
    would back-fill it from an older right row — mixed-row output)."""
    from pyspark.sql import types as T

    lcols = left.columns
    struct_t = T.StructType([right.schema[c] for c in value_cols])
    l = left.select(
        *lcols,
        F.lit(None).cast(struct_t).alias("_r"),
        F.lit(1).alias("_side"),
    )
    r = right.select(
        *key_cols, ts_col, F.struct(*[F.col(c) for c in value_cols]).alias("_r")
    )
    for c in lcols:
        if c not in (*key_cols, ts_col):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.select(*lcols, "_r", F.lit(0).alias("_side"))

    u = l.unionByName(r)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        F.last("_r", ignorenulls=True).over(w).alias("_asof"),
        "_side",
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *lcols,
            *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in value_cols],
        )
    )
