"""KMV (k-minimum-values) distinct-count sketch.

A deterministic engine-portable sketch: hash every value with md5, keep
the k smallest hashes per group, and estimate the distinct count as
(k-1) / fraction(kth-smallest hash) — the classic bottom-k estimator.
Unlike HyperLogLog (Spark's approx_count_distinct), the md5-based KMV
gives BIT-IDENTICAL results on any engine, so it can sit under the DuckDB
value-hash gate while still being a genuine sublinear sketch: per group
the state is k hashes regardless of cardinality, and the per-partition
top-k (WindowGroupLimit) keeps the shuffle bounded at k rows per
partition per group.

Groups with fewer than k distinct values have no kth hash; the estimate
falls back to the exact distinct count (the sketch IS exact below k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HASH_SPACE = float(2**60)  # first 15 hex chars of md5 as a uniform [0,1)


def _hash_fraction(h: Column) -> Column:
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("double") / F.lit(_HASH_SPACE)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 16,
) -> DataFrame:
    """Per-group distinct estimate: (group_cols..., est_distinct double,
    exact_distinct bigint). exact_distinct is returned alongside so tests
    and oracles can gate the estimator's inputs, not just its output."""
    h = df.select(*group_cols, F.md5(F.col(value_col)).alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    kth = (
        h.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == k)
        .select(*group_cols, (F.lit(k - 1) / _hash_fraction(F.col("_h"))).alias("_est"))
    )
    exact = h.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("exact_distinct"))
    return exact.join(kth, group_cols, "left").select(
        *group_cols,
        F.round(
            F.coalesce(F.col("_est"), F.col("exact_distinct").cast("double")), 6
        ).alias("est_distinct"),
        "exact_distinct",
    )
