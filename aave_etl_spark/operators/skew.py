"""Skew mitigation: salted joins for hot keys, and scan fan-out for
under-partitioned inputs.

AQE's skew-join splitting (enabled session-wide) handles most skew at
runtime by splitting oversized shuffle partitions — but it only applies to
sort-merge joins and only when statistics surface the skew. Salting is the
plan-level tool for the remaining cases: a join key so hot that one task
would receive an unbounded share of the shuffle.

Mechanics: the big side gets a deterministic salt in [0, n) appended to the
key (spreading each hot key over n tasks); the small side is replicated n
times, once per salt value. For inner and the left family the join result
is IDENTICAL to the unsalted join — the salt never leaves the plan — at
the cost of an n-fold replication of the (small) build side. right/full
are rejected: each unmatched small-side row would be emitted once per salt
value (the explode replicates it and no salt matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_cols: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join `big` to `small` on key_cols with the hot keys spread over
    `n_salts` shuffle partitions. Output columns = unsalted join output.

    The salt on the big side hashes ALL of the row's columns, so it is
    deterministic per row content (replays produce the same spread) and
    uniform even when the join key itself has two values."""
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(f"salted_join supports {sorted(allowed)}, got {how!r}")
    salted_big = big.withColumn(
        "_salt", F.pmod(F.abs(F.hash(*[F.col(c) for c in big.columns])), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        salted_big.join(salted_small, [*key_cols, "_salt"], how).drop("_salt")
    )


def fan_out_scan(df: DataFrame, key_col: str) -> DataFrame:
    """INPUT-SKEW remedy (guide §2.5): when a narrow scan arrives in fewer
    partitions than the cluster has slots — one unsplittable file, or a
    single-row-group parquet that maxPartitionBytes cannot split — every
    downstream map stage (tokenize, explode, hash, regex) runs on ONE
    task while the rest of the cluster idles. Repartition by the row key
    so the per-row work parallelizes.

    SCALE-ADAPTIVE, not a local-mode constant: the target is
    defaultParallelism (slots), and the repartition only fires when the
    scan has fewer partitions than that — on a real 100 TB input (many
    files/row groups) it is a plan-level no-op, so no corpus-wide shuffle
    is ever added at scale.

    VALUE-SAFETY CONTRACT: callers must ensure every downstream
    order-sensitive aggregation is keyed through a deterministic shuffle
    with exact semantics (int counts, min/max, string/md5 keys) before
    any floating-point accumulation — the repartition changes which task
    processes which row, so a float sum taken DIRECTLY over the scan
    layout could drift in the last ulp. Apply at narrow scan-shaped
    inputs only; the plan-shape guard below declines anything already
    carrying a join/aggregate/window (splitting those is the planner's
    job, and inspecting their RDD here could execute stages under AQE)."""
    jplan = df._jdf.queryExecution().optimizedPlan().toString()
    if any(k in jplan for k in ("Join", "Aggregate", "Window", "Repartition", "Sort")):
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # the partition probe compiles the plan to an RDD (safe for a narrow
    # plan — nothing executes), but that costs tens of ms per builder
    # call; the decision is a pure function of the scanned FILES under a
    # fixed session conf, so memoize it per file set (metadata only,
    # dies with the process)
    files = tuple(sorted(df.inputFiles()))
    fan = _FAN_DECISION.get(files) if files else None
    if fan is None:
        fan = df.rdd.getNumPartitions() < target
        if files:
            _FAN_DECISION[files] = fan
    if not fan:
        return df
    return df.repartition(target, F.col(key_col))


# (file set) -> whether the scan needs fanning out; see fan_out_scan
_FAN_DECISION: dict[tuple, bool] = {}
