"""Range (interval-containment) join via bucketization.

`fact.value BETWEEN interval.lo AND interval.hi` has no equi-key, so
Catalyst executes it as a broadcast-nested-loop (or worse, a cartesian
filter) — O(|F|·|I|) comparisons. The scalable form discretizes the value
domain into fixed-width buckets: each interval replicates to every bucket
it overlaps (bounded by interval_width / bucket_width), each fact row maps
to exactly one bucket, and the join becomes a hash equi-join on the bucket
id followed by an exact containment post-filter. Cost: one shuffle on a
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
    ends). Output columns: facts' + intervals' (minus the bucket id)."""
    bw = F.lit(float(bucket_width))
    b_facts = facts.withColumn(
        "_bucket", F.floor(F.col(value_col) / bw).cast("long")
    )
    b_iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bw).cast("long"),
                F.floor(F.col(hi_col) / bw).cast("long"),
            )
        ),
    )
    return (
        b_facts.join(b_iv, "_bucket", how)
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col)))
        .drop("_bucket")
    )
