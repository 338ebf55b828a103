"""Range (interval-containment) join via bucketization.

`fact.value BETWEEN interval.lo AND interval.hi` has no equi-key, so
Catalyst executes it as a broadcast-nested-loop (or worse, a cartesian
filter) — O(|F|·|I|) comparisons. The scalable form discretizes the value
domain into fixed-width buckets: each interval replicates to every bucket
it overlaps (bounded by interval_width / bucket_width), each fact row maps
to exactly one bucket, and the join becomes a hash equi-join on the bucket
id with the exact containment predicate in the join condition. Cost: one shuffle on a
uniform bucket key; replication factor is controlled by bucket_width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 10.0,
    how: str = "inner",
) -> DataFrame:
    """Join facts to the intervals containing their value (inclusive both
    ends). Output columns: facts' + intervals' (minus the bucket id).

    ``how`` supports inner and the left family (left/left_outer/left_semi/
    left_anti): facts map to exactly ONE bucket, so unmatched facts appear
    once. right/full would emit each unmatched interval once per overlapped
    bucket and are rejected. The containment predicate is part of the join
    CONDITION (not a post-filter) so outer semantics survive: a left join's
    NULL-padded unmatched rows are produced by the join itself. Empty
    intervals (lo > hi) contain nothing and are dropped up front —
    F.sequence would otherwise step DESCENDING through every bucket from
    floor(lo/bw) down to floor(hi/bw), silently replicating the empty
    interval across the bucket range."""
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(f"range_join supports {sorted(allowed)}, got {how!r}")
    bw = F.lit(float(bucket_width))
    b_facts = facts.withColumn(
        "_bucket", F.floor(F.col(value_col) / bw).cast("long")
    ).alias("_f")
    b_iv = (
        intervals.filter(F.col(lo_col) <= F.col(hi_col))
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo_col) / bw).cast("long"),
                    F.floor(F.col(hi_col) / bw).cast("long"),
                )
            ),
        )
        .alias("_i")
    )
    cond = (
        (F.col("_f._bucket") == F.col("_i._bucket"))
        & (F.col(f"_f.{value_col}") >= F.col(f"_i.{lo_col}"))
        & (F.col(f"_f.{value_col}") <= F.col(f"_i.{hi_col}"))
    )
    joined = b_facts.join(b_iv, cond, how)
    if how in ("left_semi", "left_anti"):
        return joined.drop("_bucket")
    return joined.drop(F.col("_f._bucket")).drop(F.col("_i._bucket"))
