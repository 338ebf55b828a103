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


def _bottom_k_estimate(
    hashes: DataFrame, group_cols: list[str], k: int, n_alias: str
) -> DataFrame:
    """Shared estimator tail over a distinct (group_cols..., _h) frame:
    kth-smallest-hash estimate with the exact-count fallback below k —
    used by BOTH the direct sketch and the merged-sketch path so the two
    can never diverge. Output: (group_cols..., est_distinct, <n_alias>)."""
    w = Window.partitionBy(*group_cols).orderBy("_h")
    kth = (
        hashes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == k)
        .select(
            *group_cols, (F.lit(k - 1) / _hash_fraction(F.col("_h"))).alias("_est")
        )
    )
    n = hashes.groupBy(*group_cols).agg(F.count(F.lit(1)).alias(n_alias))
    return n.join(kth, group_cols, "left").select(
        *group_cols,
        F.round(
            F.coalesce(F.col("_est"), F.col(n_alias).cast("double")), 6
        ).alias("est_distinct"),
        n_alias,
    )


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
    return _bottom_k_estimate(h, group_cols, k, "exact_distinct")


# ---------------------------------------------------------------------------
# HyperLogLog (DataSketches) — the MERGEABLE counterpart of KMV.
# ---------------------------------------------------------------------------
def hll_sketch_by_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL sketch BYTES (Spark 4 `hll_sketch_agg`, Apache
    DataSketches): (group_cols..., hll binary).

    This is the re-aggregatable form KMV can't give: sketches UNION
    losslessly (`hll_merge_estimate`), so a warehouse stores per-(day,
    group) sketches once and answers distinct-counts for ANY date range
    or group rollup by merging kilobyte states — never rescanning the
    raw 100 TB. The estimate is order-independent (state depends only on
    the hashed value multiset), so re-runs agree bit-for-bit; it is NOT
    engine-portable (DuckDB's sketch differs), which is why the certified
    distinct-count surface stays KMV and HLL is property-gated in pytest
    (estimate within the published error bound; merge == direct)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("hll")
    )


def hll_estimate(sketch_col: str = "hll") -> Column:
    """Estimate column for a sketch column (wrap in select/agg)."""
    return F.hll_sketch_estimate(F.col(sketch_col)).alias("est_distinct")


def hll_merge_estimate(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll",
) -> DataFrame:
    """Roll finer-grained sketches up to ``group_cols`` by HLL union and
    estimate: (group_cols..., est_distinct bigint). The union is exact
    over sketch states — merging per-day sketches gives the SAME state as
    sketching the concatenated days — so pre-aggregated sketch tables
    re-roll to any coarser grain with zero approximation added."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias("est_distinct")
    )


# ---------------------------------------------------------------------------
# Mergeable KMV — the engine-portable counterpart of the HLL pair above.
# ---------------------------------------------------------------------------
def kmv_sketch_by_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 16,
) -> DataFrame:
    """Per-group KMV sketch: (group_cols..., kmv array<string>) holding
    the k smallest md5 hashes of the group's DISTINCT values (all of
    them when the group has fewer than k).

    KMV merges losslessly: the k smallest hashes of a union are always
    among the per-part k smallest, so ``kmv_merge_estimate`` over stored
    per-(day, group) sketches equals the direct sketch of the
    concatenated data EXACTLY — and unlike HLL the state is plain md5
    strings, bit-identical on any engine, so the whole store-then-merge
    pipeline sits under the DuckDB value-hash gate. The build k rides
    along as a `kmv_k` column (the params-sidecar discipline) so a merge
    with a LARGER k — which would silently bias the estimate, the union
    not being the true bottom-k' — raises instead."""
    h = df.select(*group_cols, F.md5(F.col(value_col)).alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        h.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("_h")).alias("kmv"))
        .withColumn("kmv_k", F.lit(int(k)))
    )


def kmv_merge_estimate(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "kmv",
    k: int = 16,
) -> DataFrame:
    """Union finer-grained KMV sketches up to ``group_cols`` and estimate:
    (group_cols..., est_distinct double). Explode → distinct hashes →
    the shared `_bottom_k_estimate` tail (kth-smallest estimate,
    exact-count fallback when the union holds fewer than k hashes — then
    every member sketch was untruncated, so the union IS the full
    distinct hash set).

    ``k`` must be ≤ the sketches' build k (validated against the `kmv_k`
    column when present): estimating with a larger k would read the kth
    pooled hash as the true kth-smallest when each part was truncated
    earlier — a silent downward bias. A smaller k is fine (the union
    contains the true bottom-k for every k ≤ build k). The check is LAZY
    — folded into the explode projection so building the plan stays free
    (no extra lineage execution); a violation surfaces as a
    SparkRuntimeException when the merge actually runs."""
    sk = _guard_merge_k(df, sketch_col, "kmv_k", k, "kmv_merge_estimate")
    ex = df.select(*group_cols, F.explode(sk).alias("_h")).distinct()
    return _bottom_k_estimate(ex, group_cols, k, "_n").drop("_n")


def topk_sketch_by_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 32,
) -> DataFrame:
    """Per-group mergeable HEAVY-HITTERS summary: (group_cols..., hh
    array<struct<_v,_c>>, rest_max, hh_m) — the part's EXACT per-value
    counts truncated to the top ``m`` by (count desc, value), plus
    ``rest_max`` = the largest DROPPED count (0 when nothing dropped).

    Unlike Misra–Gries/SpaceSaving (whose state depends on arrival order
    and is not engine-portable), this summary is a pure deterministic
    function of the value multiset, so it sits under the dual-engine
    value-hash gate. rest_max is the undercount bound `topk_merge` needs:
    a value absent from this part's top-m occurred at most rest_max times
    here. State per part is m pairs + one bound; the per-value count is a
    map-side-combined aggregate, so hot values never skew a task."""
    cnt = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_c").desc(), F.col(value_col)
    )
    # rank m+1 is EXACTLY rest_max (counts descend), so cutting there is
    # lossless — and the row_number filter right above the window triggers
    # WindowGroupLimit: each map partition pre-trims to m+1 rows per group
    # before the shuffle, so a million-term vocabulary never sorts whole
    # in one task (the module's bounded-shuffle discipline)
    ranked = cnt.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= m + 1
    )
    return ranked.groupBy(*group_cols).agg(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("_rn") <= m,
                    F.struct(F.col(value_col).alias("_v"), F.col("_c")),
                )
            )
        ).alias("hh"),
        F.coalesce(
            F.max(F.when(F.col("_rn") > m, F.col("_c"))), F.lit(0)
        ).cast("long").alias("rest_max"),
        F.lit(int(m)).alias("hh_m"),
    )


def topk_merge(
    df: DataFrame,
    group_cols: list[str],
    k: int = 10,
    sketch_col: str = "hh",
    rest_col: str = "rest_max",
) -> DataFrame:
    """Union per-part heavy-hitters summaries up to ``group_cols`` and
    rank: (group_cols..., value, count_lb, count_ub, rank, exact) — top-k
    by lower-bound count, ties by value.

    Bounds: ``count_lb`` sums the value's counts over the parts whose
    top-m it made (every count stored is exact, so lb ≤ true count);
    ``count_ub`` adds each ABSENT part's rest_max (the value occurred at
    most that often there), so true count ≤ ub always. ``exact`` marks
    values whose bounds coincide (present in every part, or absent only
    from parts that dropped nothing): lb == ub == true count — for
    genuinely heavy values across slices this is the common case, so the
    rollup usually returns exact counts without rescanning anything. Store
    per-(day, group) summaries once; answer any coarser top-k with
    honest bounds from m-row states."""
    part_tot = df.groupBy(*group_cols).agg(
        F.sum(rest_col).cast("long").alias("_all_rest")
    )
    ex = df.select(
        *group_cols, F.col(rest_col).alias("_rm"), F.explode(sketch_col).alias("_s")
    )
    per_val = ex.groupBy(*group_cols, F.col("_s._v").alias("value")).agg(
        F.sum("_s._c").cast("long").alias("count_lb"),
        F.sum("_rm").cast("long").alias("_present_rest"),
    )
    # eqNullSafe join: a NULL group value (a NULL partition slice) is a
    # real group in both aggregates — plain equality would silently drop
    # its heavy hitters from the rollup
    tj = part_tot.select(
        *[F.col(c).alias(f"_t_{c}") for c in group_cols], "_all_rest"
    )
    cond = None
    for c in group_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_t_{c}"))
        cond = eq if cond is None else (cond & eq)
    ub = (F.col("count_lb") + F.col("_all_rest") - F.col("_present_rest")).cast(
        "long"
    )
    bounded = per_val.join(F.broadcast(tj), cond).select(
        *group_cols,
        "value",
        "count_lb",
        ub.alias("count_ub"),
        (ub == F.col("count_lb")).alias("exact"),
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("count_lb").desc(), F.col("value")
    )
    return (
        bounded.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _guard_merge_k(
    df: DataFrame, sketch_col: str, k_col: str, k: int, label: str
) -> Column:
    """The merge-k ≤ build-k gate shared by every bottom-k sketch (KMV,
    row-sample): merging at a k LARGER than the parts were truncated to
    silently biases the pooled bottom-k, so the guard raises instead. LAZY
    (folded into the projection, raise_error at run time) so plan-building
    stays free."""
    sk = F.col(sketch_col)
    if k_col not in df.columns:
        return sk
    return F.when(F.col(k_col) >= F.lit(int(k)), sk).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{label}: merge k={k} > sketch build k="),
                F.col(k_col).cast("string"),
                F.lit(
                    " — the pooled union is not the true bottom-k at"
                    " this k, the result would be silently biased"
                ),
            )
        )
    )


# ---------------------------------------------------------------------------
# Mergeable row-sample QUANTILE sketch — the percentile counterpart of the
# KMV distinct pair: bottom-k rows by a deterministic id hash ARE a uniform
# k-sample, and the bottom-k of a union of bottom-k parts is exactly the
# bottom-k of the union — so per-(day, group) samples stored once re-roll
# to any coarser grain with merge == direct, bit-identically on any engine.
# ---------------------------------------------------------------------------
def rowsample_sketch_by_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "rsq",
) -> DataFrame:
    """Per-group mergeable uniform-row-sample sketch: (group_cols...,
    rsq array<struct<_h,_v>>, rsq_k) holding the k rows with the smallest
    md5(salt:id) hashes and their values.

    ``id_col`` must be row-unique ACROSS every part that will ever merge
    (a fact id, not a day-local counter): the hash race is the sampling
    mechanism, and a repeated id would enter the pool once per part.
    State per group is k (hash, value) pairs regardless of row count; the
    per-partition top-k (WindowGroupLimit) bounds the shuffle at k rows
    per partition per group."""
    h = df.select(
        *group_cols,
        F.md5(
            F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
        ).alias("_h"),
        F.col(value_col).cast("double").alias("_v"),
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        h.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list(F.struct("_h", "_v"))).alias("rsq"))
        .withColumn("rsq_k", F.lit(int(k)))
    )


def rowsample_merge_quantiles(
    df: DataFrame,
    group_cols: list[str],
    qs: tuple = (0.5, 0.9, 0.99),
    sketch_col: str = "rsq",
    k: int = 64,
) -> DataFrame:
    """Union finer-grained row-sample sketches up to ``group_cols`` and
    estimate quantiles from the pooled sample: (group_cols..., n_sample,
    p50, p90, ... — one 6dp column per entry of ``qs``, linear
    interpolation, the percentile/quantile_cont definition both engines
    share). Bottom-k of the union restores a true uniform k-sample of the
    concatenated rows, so merging stored per-day sketches equals
    sketching the concatenated days EXACTLY — groups whose pooled sample
    holds fewer than k rows were never truncated, and their quantiles are
    exact. ``k`` must be ≤ the sketches' build k (validated lazily
    against ``rsq_k`` like `kmv_merge_estimate`): pooling parts truncated
    earlier than the merge k would bias the sample toward small hashes
    unevenly across parts."""
    sk = _guard_merge_k(df, sketch_col, "rsq_k", k, "rowsample_merge_quantiles")
    ex = df.select(*group_cols, F.explode(sk).alias("_s"))
    w = Window.partitionBy(*group_cols).orderBy("_s._h")
    samp = ex.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    # %g, not int(q*100): truncation would mislabel sub-percent quantiles
    # (0.975 -> 'p97') and collide names (0.97 and 0.975 both 'p97')
    names = [("p" + ("%g" % (q * 100)).replace(".", "_")) for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"rowsample_merge_quantiles: duplicate qs {qs}")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_sample")] + [
        F.round(F.expr(f"percentile(_s._v, {q})"), 6).alias(n)
        for q, n in zip(qs, names)
    ]
    return samp.groupBy(*group_cols).agg(*aggs)
