"""Deterministic corpus sampling: hash-fraction sampling, stratified
exact-k sampling, and train/test splitting.

Training-data curation needs samples that are (a) reproducible across
runs and engines — so no `rand()`, whose value depends on seed, partition
layout, and task retries — and (b) stable under corpus growth: a document
keeps its sample/split assignment when neighbors are added or removed.
Both fall out of hashing the document id: u(id) = md5(salt || id) mapped
to [0, 1) is a fixed uniform score per document.

Plan shapes:

- fraction sample / split: a narrow map (one md5 + compare per row), no
  shuffle. Filter pushdown applies as usual.
- stratified exact-k: row_number over (stratum, hash order) — one shuffle
  on the stratum key. The rank<=k filter is a WindowGroupLimit: Spark
  keeps only k rows per partition BEFORE the exchange, so the shuffle
  carries O(partitions x k) rows per stratum, not the stratum. This is
  deterministic reservoir sampling: the "reservoir" is the k smallest
  hash values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 16^15 — md5's first 15 hex chars as an integer fit a signed long
_HASH_SPACE = float(16**15)


def uniform_hash(id_col: Column | str, salt: str) -> Column:
    """Deterministic uniform score in [0, 1): the first 15 hex chars of
    md5(salt || ':' || id) as an integer, scaled. Engine-portable (DuckDB:
    CAST('0x' || substring(md5(..), 1, 15) AS BIGINT) / 16^15)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat_ws(":", F.lit(salt), c.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") / F.lit(_HASH_SPACE)


def hash_fraction_sample(
    df: DataFrame, id_col: str = "doc_id", fraction: float = 0.1, salt: str = "sample"
) -> DataFrame:
    """Keep ~fraction of rows, chosen by id hash — reproducible, growth-
    stable, and exactly repartition-invariant. Narrow map, no shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(uniform_hash(id_col, salt) < fraction)


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    test_frac: float = 0.2,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/test split: adds ``split_col`` ('train'/'test')
    from the id hash. A document's assignment never changes as the corpus
    grows — the property that keeps eval sets uncontaminated across
    dataset versions. Narrow map, no shuffle."""
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError(f"test_frac must be in [0, 1], got {test_frac}")
    u = uniform_hash(id_col, salt)
    return df.withColumn(
        split_col, F.when(u < test_frac, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_exact_k(
    df: DataFrame,
    group_cols: list[str],
    id_col: str = "doc_id",
    k: int = 10,
    salt: str = "sample",
) -> DataFrame:
    """EXACTLY min(k, |stratum|) rows per stratum: the k documents with the
    smallest hash scores (ties broken by id — a total order, so the result
    is unique). Adds ``sample_rank`` (1-based). Equivalent to per-stratum
    reservoir sampling with a fixed seed, but deterministic and
    distributed: one shuffle on the stratum key, WindowGroupLimit keeps
    only k rows per map partition before the exchange."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(*group_cols).orderBy(
        uniform_hash(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def top_fraction_by_group(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    frac: float,
    id_col: str = "doc_id",
    approximate: bool = False,
) -> DataFrame:
    """Per-group quality gate: keep the top ``frac`` of each group by
    score — "top 50% by quality per language", the selection step after
    quality scoring in a curation pipeline.

    Exact form (default): rank over (group, score DESC, id) against
    ceil(round(n_group * frac, 9)) — adds ``q_rank``, ``n_group``,
    ``kept``; every row is returned with its verdict so downstream can
    audit the cut. Deterministic: ties break by id (a total order).

    ORACLE-PARITY CONTRACT: the cut is ceil(round(x, 9)), NOT plain
    ceil(x) — IEEE products like 0.07 * 100 = 7.000000000000001 must keep
    7 rows, not 8. Any SQL twin certifying a NON-dyadic ``frac`` (anything
    not exactly representable in binary: 0.07, 0.1, ...) must replicate
    the guard verbatim: ``ceil(round(n_group * f, 9))``. A plain-ceil
    oracle agrees only for dyadic fractions (0.5, 0.25, ...).

    ``approximate=True`` is the 100 TB path: the per-group score threshold
    comes from ``percentile_approx`` (one agg pass, bounded sketch state),
    broadcast-joins back, and rows keep iff score >= threshold — no
    full per-group sort of the corpus, at the cost of tie/epsilon slop
    around the boundary. The exact form is the certification twin; the
    approximate form is property-tested against it (tests/test_operators.py).
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    if approximate:
        thr = df.groupBy(*group_cols).agg(
            F.percentile_approx(score_col, 1.0 - frac).alias("_thr")
        )
        joined = df.join(F.broadcast(thr), group_cols)
        return joined.withColumn("kept", F.col(score_col) >= F.col("_thr")).drop("_thr")
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    wg = Window.partitionBy(*group_cols)
    ranked = df.withColumn("q_rank", F.row_number().over(w).cast("long")).withColumn(
        "n_group", F.count(F.lit(1)).over(wg).cast("long")
    )
    # round before ceil: IEEE products like 0.07 * 100 = 7.000000000000001
    # must cut at ceil(7) = 7 kept rows, not silently over-keep an 8th
    return ranked.withColumn(
        "kept", F.col("q_rank") <= F.ceil(F.round(F.col("n_group") * F.lit(frac), 9))
    )


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    group_cols: list[str] | None = None,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows (per group): the
    Efraimidis–Spirakis A-ES one-pass scheme — each row draws a
    deterministic uniform u from its id hash and races with an
    exponential clock ``sample_key = -ln(u) / w``; the k SMALLEST keys
    win, which is exactly weight-proportional sampling without
    replacement (Efraimidis & Spirakis 2006). The quality-weighted corpus
    draw every curation pipeline wants once documents carry scores:
    P(row among the k) follows its weight, no two-pass normalization, no
    global weight sum.

    Deterministic and engine-portable: u = (md5-prefix + 0.5) / 16^15
    (half-up so u is never exactly 0 — ln(0) is NULL in Spark and would
    silently win every draw), the key rounds to 9dp before ranking and
    ties break by id — re-runs, engine swaps, and repartitions never
    flip a draw. Under ingest, a row's RELATIVE clock order within its
    group is preserved (the normalizer rescales every key by the same
    positive constant), so evictions come from genuine competition —
    with one caveat: if ingest changes the group's max weight, the
    rescale can create or break ties at the 9th decimal place, where the
    id tie-break decides; exact bit-stability under ingest holds only
    while the group max is unchanged. Rows with NULL or non-positive
    weight cannot win a weighted draw and are excluded.

    SCALE-FREE WEIGHTS: the clock divides by w NORMALIZED to the
    (group's/global) max weight, w' = w / max(w) <= 1, so sample_key >=
    -ln(u) regardless of the caller's weight units. Without this, the
    9 ABSOLUTE-decimal-place rounding the engine-parity contract needs
    would collapse keys of heavy rows (w >~ 1e8 relative to -ln(u)) to
    0.000000000 and the "draw" would degrade to ascending id; normalized,
    a key rounds to zero only with probability ~5e-10 per row.
    Normalization is order-preserving per group (a positive constant
    scale), so the sampling distribution is untouched — only the rounding
    robustness changes. Any SQL twin must normalize identically.

    Output: the winning rows + (sample_key, sample_rank). Dataflow at
    100 TB: the max-weight normalizer is one map-side-combined aggregate
    (group-cardinality rows) BROADCAST back — deliberately not a window
    max, which would sit on the rank window's exchange and destroy its
    map-side WindowGroupLimit trim. The normalizer is a SECOND scan of
    the input lineage (cache/checkpoint upstream if that lineage is
    expensive), and the broadcast is group-cardinality rows — fine for
    domain-like groups (languages, sources), not for high-cardinality
    group keys (the same contract as every weights-broadcast in this
    module). Grouped form = one shuffle on the group key with the
    per-group top-k window capped map-side (WindowGroupLimit); global
    form = sort + LIMIT k, which Spark executes as a distributed
    TakeOrdered (per-partition top-k, never a full global sort).
    NULL-valued groups keep their draws: the normalizer joins back
    NULL-safely."""
    from functools import reduce

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    reserved = {"_wmax"} | {f"_g_{c}" for c in (group_cols or [])}
    clashes = sorted(reserved & set(df.columns))
    if clashes:
        raise ValueError(
            f"weighted_sample_k: input columns {clashes} collide with the"
            " operator's internal normalizer names — rename them first"
        )
    w = F.col(weight_col).cast("double")
    # u = (h + 0.5) / 16^15, never exactly 0: ln(0) is NULL in Spark (a
    # NULL key would sort FIRST and silently win every draw) and a finite
    # value in DuckDB — the same half-up guard the DSIR sampler uses
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    u = (F.conv(F.substring(h, 1, 15), 16, 10).cast("double") + F.lit(0.5)) / F.lit(
        float(2**60)
    )
    eligible = df.filter(w.isNotNull() & (w > 0))
    if group_cols:
        wmax = eligible.groupBy(*group_cols).agg(F.max(w).alias("_wmax")).select(
            *[F.col(c).alias(f"_g_{c}") for c in group_cols], "_wmax"
        )
        cond = reduce(
            lambda a, b: a & b,
            [F.col(c).eqNullSafe(F.col(f"_g_{c}")) for c in group_cols],
        )
        base = eligible.join(F.broadcast(wmax), cond).drop(
            *[f"_g_{c}" for c in group_cols]
        )
    else:
        base = eligible.crossJoin(
            F.broadcast(eligible.agg(F.max(w).alias("_wmax")))
        )
    key = F.round(-F.log(u) / (w / F.col("_wmax")), 9)
    scored = base.withColumn("sample_key", key).drop("_wmax")
    if group_cols:
        win = Window.partitionBy(*group_cols).orderBy(
            F.col("sample_key"), F.col(id_col)
        )
        return (
            scored.withColumn("sample_rank", F.row_number().over(win).cast("long"))
            .filter(F.col("sample_rank") <= k)
        )
    ordered = scored.orderBy(F.col("sample_key"), F.col(id_col)).limit(k)
    rw = Window.orderBy(F.col("sample_key"), F.col(id_col))
    # rank assigned AFTER the limit: the window sees k rows, not the corpus
    return ordered.withColumn("sample_rank", F.row_number().over(rw).cast("long"))


def mix_corpus(
    df: DataFrame,
    weights: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
    default_frac: float = 0.0,
) -> DataFrame:
    """Domain mixing: downsample each group to its target rate — the
    "data mix" step that turns raw source proportions into the training
    distribution. ``weights`` is a (group, keep_frac) table; rows keep iff
    their id hash score < their group's rate (groups absent from
    ``weights`` get ``default_frac``).

    Same determinism contract as the other samplers: a document's fate
    depends only on (salt, id, its group's rate), so re-runs, engine
    swaps, and corpus growth never flip it — and per-group subsets nest
    as rates increase. Plan: one broadcast left join on the group key
    (weights are domain-cardinality, tiny by definition) + a narrow
    filter; no shuffle of the corpus.

    NULL-group rows are first-class (the eqNullSafe group-join
    discipline): an un-identified-language slice is exactly the slice a
    mixing policy most needs to rate explicitly, so a NULL group in
    ``weights`` matches the corpus's NULL-group rows; a NULL-group
    corpus row with NO NULL weights row falls to ``default_frac`` like
    any other unlisted group — never silently mis-bucketed."""
    if "keep_frac" not in weights.columns:
        raise ValueError("weights must have a keep_frac column")
    # both internal join columns get the loud contract error: a df that
    # already carries keep_frac would otherwise make the filter's
    # F.col("keep_frac") ambiguous after the join and die with an opaque
    # AnalysisException deep in the plan
    for clash in ("_mix_g", "keep_frac"):
        if clash in df.columns:
            raise ValueError(
                f"mix_corpus: input column {clash!r} collides with the"
                " operator's internal join alias — rename it first"
            )
    # project the weights table to (group, keep_frac) so stray columns on a
    # caller's weights frame never leak into the mixed corpus's schema;
    # alias the key so the NULL-safe join condition is unambiguous
    w = weights.select(F.col(group_col).alias("_mix_g"), "keep_frac")
    joined = df.join(
        F.broadcast(w), F.col(group_col).eqNullSafe(F.col("_mix_g")), "left"
    )
    kept = joined.filter(
        uniform_hash(id_col, salt)
        < F.coalesce(F.col("keep_frac"), F.lit(float(default_frac)))
    )
    # restore the caller's columns (dropping _mix_g / keep_frac)
    return kept.select(*df.columns)


def hashed_ngram_buckets(
    df: DataFrame,
    m: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document hashed-n-gram bucket counts — the DSIR feature state:
    ``(id, *extra_cols, _b, _c)`` where ``_b`` hashes each unigram+bigram
    (WITH multiplicity) into ``m`` buckets via the repo's engine-portable
    md5-prefix hash and ``_c`` counts the doc's grams in that bucket.

    This is the MERGEABLE half of DSIR (Xie 2023, arXiv:2302.03169): a
    corpus distribution is just ``sum(_c) GROUP BY _b`` — an m-row table —
    and sums over per-day slices equal the sum over the union, so a daily
    pipeline can persist per-day bucket counts through the TableStore and
    importance-weight any batch against the ACCUMULATED distribution
    without rescanning the corpus (the sketch-state pattern the HH/KMV
    rollups certify, applied to DSIR). One gram explode + one m-bounded
    map-side-combined shuffle; nothing scales past |docs| x avg-grams.

    Value-safety of the scan fan-out: the first downstream aggregation is
    the exact-int (id, _b) COUNT keyed by its own deterministic shuffle,
    so per-row placement cannot move any float (guide §2.5; measured
    2.4x on the gram pass over a single-row-group input)."""
    from aave_etl_spark.operators.skew import fan_out_scan

    df = fan_out_scan(df, id_col)
    toked = df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
        ).alias("_toks"),
    )
    toks = F.col("_toks")
    uni = toks
    bi = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = toked.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.explode(F.concat(uni, bi)).alias("_gram"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("_gram")), 1, 15), 16, 10).cast("long")
        % F.lit(m)
    )
    return (
        grams.select(F.col(id_col), *[F.col(c) for c in extra_cols], bucket.alias("_b"))
        .groupBy(id_col, *extra_cols, "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )


def dsir_log_ratio(tgt: DataFrame, raw: DataFrame, m: int) -> DataFrame:
    """The Laplace-smoothed per-bucket log-likelihood ratio table
    ``(_b, _lr)`` from two aggregated bucket-count frames — ``tgt``
    ``(_b, _ct)`` and ``raw`` ``(_b, _cr)``. The counts may come from an
    in-flight aggregate over doc buckets OR from rolled-up at-rest per-day
    states (sums commute); both totals are one-row broadcasts, so the
    ratio table is m rows regardless of corpus size.

    The table covers the FULL bucket domain 0..m-1 (counts coalesced to
    0 = the smoothing prior), not just the buckets the distributions
    happened to hit — so scoring a batch against a distribution that has
    never seen one of the batch's buckets applies the prior's nonzero
    log-ratio instead of silently dropping the bucket from the weight (a
    batch scored against a rolled-up state that hasn't ingested it yet
    is exactly the accumulated-distribution use case)."""
    spark = raw.sparkSession
    domain = spark.range(int(m)).select(F.col("id").cast("long").alias("_b"))
    tot_t = F.broadcast(tgt.agg(F.sum("_ct").cast("double").alias("_nt")))
    tot_r = F.broadcast(raw.agg(F.sum("_cr").cast("double").alias("_nr")))
    return (
        domain.join(raw, "_b", "left")
        .join(tgt, "_b", "left")
        .crossJoin(tot_t)
        .crossJoin(tot_r)
        .select(
            "_b",
            (
                F.log((F.coalesce(F.col("_ct"), F.lit(0)).cast("double") + 1.0)
                      / (F.col("_nt") + float(m)))
                - F.log((F.coalesce(F.col("_cr"), F.lit(0)).cast("double") + 1.0)
                        / (F.col("_nr") + float(m)))
            ).alias("_lr"),
        )
    )


def dsir_scores(
    doc_buckets: DataFrame, ratio: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document DSIR importance weights from bucket counts and a
    log-ratio table: ``(id, n_grams, _w)`` — ``_w`` UNROUNDED so callers
    that derive further keys from it (the Gumbel-top-k sample key) don't
    compound rounding; round to 6dp at the output boundary (the repo's
    float-hash parity discipline). The ratio side broadcasts (m rows);
    one map-side-combined aggregate per doc."""
    return (
        doc_buckets.join(F.broadcast(ratio), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_c").cast("long").alias("n_grams"),
            F.sum(F.col("_c").cast("double") * F.col("_lr")).alias("_w"),
        )
    )


def dsir_sample_key(
    w: Column, doc_id: Column, temperature: float = 1.0
) -> Column:
    """The deterministic Gumbel-top-k SAMPLE KEY from an (unrounded) DSIR
    weight: ``round(w/T + Gumbel(md5('dsir:'||id)), 6)`` — the inverse-CDF
    Gumbel over the md5-uniform u = (h + 0.5)/16^15, so keeping the k
    largest keys samples without replacement ∝ exp(w/T) reproducibly
    across engines and partitionings. Shared by the standalone
    ``dsir_importance_resample`` and the corpus pipeline's state-backed
    gate resample (plans/corpus_pipeline.py) so both derive bit-identical
    keys; any SQL twin renders the same expression structure
    (queries/llm.py ``_DSIR_GUMBEL``)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit("dsir"), doc_id.cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_HASH_SPACE)
    gumbel = -F.log(-F.log(u))
    return F.round(w / F.lit(temperature) + gumbel, 6)


def global_desc_rank(
    df: DataFrame,
    key_col: str,
    id_col: str,
    rank_col: str = "_rk",
) -> DataFrame:
    """EXACT global 1-based rank under (``key_col`` DESC, ``id_col`` ASC)
    WITHOUT the single-task funnel of a partition-less ``row_number``
    window (``Window.orderBy`` forces an Exchange SinglePartition — every
    row through one task, the scale-killer the exact top-k forms in this
    module used to carry).

    Distributed shape: range-repartition on the total order (so partition
    i holds strictly higher-ranked rows than partition i+1), rank LOCALLY
    per partition (the window is partitioned by ``spark_partition_id`` —
    parallel), then add each partition's broadcast cumulative offset
    (per-partition counts joined triangularly over <= num-partitions rows
    — no SinglePartition exchange anywhere, plan-asserted in
    tests/test_plans.py). The output rank depends only on the TOTAL ORDER
    (offset + local rank), never on where the sampled range boundaries
    land, so it is deterministic and equal to the naive global window —
    property-pinned in tests/test_operators.py. The ordering must be
    total: ``id_col`` ties-breaks equal keys.

    The range exchange is lineage-cut so the pid attached to a row is
    computed once and shared by the local ranking and the offset counts."""
    ordering = [F.col(key_col).desc(), F.col(id_col).asc()]
    withpid = (
        df.repartitionByRange(*ordering)
        .withColumn("_gdr_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    wloc = Window.partitionBy("_gdr_pid").orderBy(*ordering)
    local = withpid.withColumn("_gdr_lrk", F.row_number().over(wloc))
    sizes = withpid.groupBy("_gdr_pid").agg(
        F.count(F.lit(1)).alias("_gdr_n")
    )
    offsets = (
        sizes.select(F.col("_gdr_pid").alias("_gdr_pa"))
        .join(
            sizes.select(
                F.col("_gdr_pid").alias("_gdr_pb"), F.col("_gdr_n")
            ),
            F.col("_gdr_pb") < F.col("_gdr_pa"),
            "left",
        )
        .groupBy(F.col("_gdr_pa").alias("_gdr_pid"))
        .agg(F.coalesce(F.sum("_gdr_n"), F.lit(0)).alias("_gdr_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_gdr_pid")
        .withColumn(
            rank_col, (F.col("_gdr_off") + F.col("_gdr_lrk")).cast("long")
        )
        .drop("_gdr_pid", "_gdr_lrk", "_gdr_off")
    )


def dsir_importance_resample(
    df: DataFrame,
    target_pred: str = "lang = 'en'",
    m: int = 256,
    keep_frac: float = 0.25,
    temperature: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    approximate: bool = False,
) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, arXiv:2302.03169): score raw documents by how target-like their
    hashed-n-gram distribution is, then Gumbel-top-k resample.

    1. features: unigrams + bigrams WITH multiplicity, hashed into ``m``
       buckets (md5 hex prefix mod m — the repo's engine-portable hash).
    2. bucket distributions: target = rows matching ``target_pred``; raw =
       the whole corpus; Laplace-smoothed p[b] = (c[b]+1)/(n+m).
    3. weight(doc) = Σ_b c_doc[b]·(ln p_target[b] − ln p_raw[b]) — the
       bag-of-hashed-ngrams log-likelihood ratio.
    4. resample: key = weight/temperature + Gumbel(md5(id)) (deterministic
       inverse-CDF Gumbel, so the Gumbel-top-k trick — equivalent to
       sampling without replacement ∝ exp(weight/T) — stays reproducible
       across engines/partitionings); keep the ceil(keep_frac·N) largest.

    Output: (id, n_grams, weight, sample_key, kept).

    Scale: gram explode + one m-bounded bucket shuffle; both distributions
    are m-row aggregates broadcast into the scorer. The exact global
    top-k rank (default) runs in the DISTRIBUTED form
    (:func:`global_desc_rank` — range-partitioned local ranks + broadcast
    offsets; answer identical to a partition-less window, no single-task
    funnel). ``approximate=True`` trades the exact boundary for one fewer
    shuffle: the cut threshold comes from
    ``percentile_approx(sample_key, 1-keep_frac)`` (one agg pass, bounded
    sketch state) broadcast into a narrow filter — no ranking pass at all,
    at the cost of epsilon slop around the boundary
    (the same exact→approx swap as top_fraction_by_group; property-tested
    against the exact form in tests/test_operators.py)."""
    pre = df.select(
        F.col(id_col), F.col(text_col), F.expr(target_pred).alias("_is_target")
    )
    # the bucket table feeds the target distribution, the raw distribution
    # AND the scorer — cut the lineage so the corpus-wide gram explode (the
    # dominant cost) runs once, not once per consumer
    doc_buckets = hashed_ngram_buckets(
        pre, m=m, id_col=id_col, text_col=text_col, extra_cols=("_is_target",)
    ).localCheckpoint(eager=False)

    # m-row Laplace-smoothed distributions; ln-ratio per bucket. Every
    # bucket 0..m-1 participates via the smoothing prior, so the ratio
    # table is built over the raw buckets (superset of target's) with
    # target counts coalesced to 0 (dsir_log_ratio's LEFT join).
    tgt = (
        doc_buckets.filter("_is_target")
        .groupBy("_b")
        .agg(F.sum("_c").alias("_ct"))
    )
    raw = doc_buckets.groupBy("_b").agg(F.sum("_c").alias("_cr"))
    ratio = dsir_log_ratio(tgt, raw, m)
    scored = dsir_scores(doc_buckets, ratio, id_col=id_col)
    # keyed feeds the count aggregate and the final ranked select — both
    # recompute only the cheap scoring join over the CHECKPOINTED bucket
    # table, so no second lineage cut is needed (and the executed plan
    # stays inspectable for the plan-assert suite). The key derivation
    # (md5-uniform u half-shifted into (0,1), inverse-CDF Gumbel) lives in
    # dsir_sample_key — shared with the corpus pipeline's gate resample
    keyed = scored.select(
        F.col(id_col),
        "n_grams",
        F.round(F.col("_w"), 6).alias("weight"),
        dsir_sample_key(
            F.col("_w"), F.col(id_col), temperature
        ).alias("sample_key"),
    )
    if approximate:
        # keep_frac=0.0 must keep NOTHING, like the exact form's
        # ceil(0·n)=0 — but percentile_approx(key, 1.0) is the MAXIMUM
        # key, and `>= max` keeps at least one row; short-circuit instead
        if keep_frac <= 0.0:
            return keyed.select(
                F.col(id_col), "n_grams", "weight", "sample_key",
                F.lit(False).alias("kept"),
            )
        # one sketch agg over the scored corpus → a scalar threshold,
        # broadcast into a narrow filter; keep_frac=1.0 degenerates to the
        # minimum key, so every row keeps (>= min) like the exact form
        thr = F.broadcast(
            keyed.agg(
                F.percentile_approx("sample_key", 1.0 - keep_frac).alias("_thr")
            )
        )
        return keyed.crossJoin(thr).select(
            F.col(id_col),
            "n_grams",
            "weight",
            "sample_key",
            (F.col("sample_key") >= F.col("_thr")).alias("kept"),
        )
    total = F.broadcast(keyed.agg(F.count(F.lit(1)).cast("double").alias("_n")))
    # exact global rank in the DISTRIBUTED form (range-partitioned local
    # ranks + offsets) — no partition-less window, no single-task funnel
    return (
        global_desc_rank(keyed, "sample_key", id_col)
        .crossJoin(total)
        .select(
            F.col(id_col),
            "n_grams",
            "weight",
            "sample_key",
            (F.col("_rk") <= F.ceil(F.lit(keep_frac) * F.col("_n"))).alias("kept"),
        )
    )


def epoch_shards(
    df: DataFrame,
    n_shards: int = 8,
    seed: str = "epoch0",
    id_col: str = "doc_id",
    sub_prefix_len: int = 2,
) -> DataFrame:
    """Deterministic epoch shuffle + shard assignment: the step between
    curation and the data loader. Every training run needs a reproducible
    document order that (a) differs per epoch, (b) splits evenly across
    N loader workers, and (c) never depends on file layout or engine
    partitioning — so both are derived from a content hash, not from
    row position.

    shard    = md5(seed:id) mod n_shards  — uniform, seed-keyed
    position = rank of md5(seed:id) WITHIN the shard — each worker reads
               its shard in `position` order and the global order is
               reproducible from (seed, n_shards) alone.

    Output: (id, shard, position, sort_key).

    Scale: one hash projection + a TWO-LEVEL rank — there is NO global
    order-by, and (unlike a naive ``row_number() over (partition by
    shard)``, which funnels |corpus|/n_shards rows through one task per
    shard) no window partition is wider than a sub-bucket either.
    Because ``sort_key`` is an md5 hex string, its leading
    ``sub_prefix_len`` hex chars are a prefix of the sort order: ranking
    within (shard, sub-bucket) and adding a broadcast count-prefix
    offset over the tiny (shard, sub) grid reproduces the per-shard
    rank exactly.  With the default ``sub_prefix_len=2`` each shard
    splits into 256 hash-uniform sub-buckets, so window parallelism is
    ``n_shards * 256`` tasks of |corpus|/(n_shards*256) rows — at 100 TB
    and 8 shards that is ~50 GB per task instead of ~12.5 TB.  The grid
    itself is ``n_shards * 16^sub_prefix_len`` rows (2 048 by default):
    a map-side-combined count + a driver-trivial prefix sum, broadcast
    back so the final join is exchange-free on the ranked side.
    Re-sharding for a new epoch is a new seed, not a data move."""
    if not 1 <= sub_prefix_len <= 4:
        raise ValueError("sub_prefix_len must be in [1, 4]")
    key = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    keyed = df.select(
        F.col(id_col),
        key.alias("sort_key"),
        (
            F.conv(F.substring(key, 1, 15), 16, 10).cast("long") % n_shards
        ).cast("int").alias("shard"),
    ).withColumn("_sub", F.substring("sort_key", 1, sub_prefix_len))
    # Level 1: rank within (shard, sub-bucket) — bounded-width windows.
    w = Window.partitionBy("shard", "_sub").orderBy("sort_key", id_col)
    ranked = keyed.withColumn("_rk", F.row_number().over(w).cast("long"))
    # Level 2: broadcast count-prefix offsets over the (shard, sub) grid.
    grid = Window.partitionBy("shard").orderBy("_sub").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        keyed.groupBy("shard", "_sub")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_off", F.coalesce(F.sum("_cnt").over(grid), F.lit(0)))
        .select("shard", "_sub", "_off")
    )
    return (
        ranked.join(F.broadcast(offsets), ["shard", "_sub"])
        .select(
            F.col(id_col),
            "shard",
            (F.col("_off") + F.col("_rk")).alias("position"),
            "sort_key",
        )
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str = "lang",
    mass_col: str = "n_chars",
    alpha: float = 0.7,
    budget: float | None = None,
) -> DataFrame:
    """Temperature-scaled mixture planning (the mC4 / XLM-R recipe,
    Conneau et al. 2020): group shares ∝ mass^alpha, so low-resource
    groups are up-weighted relative to their raw share (alpha=1 is
    proportional, alpha→0 is uniform). Output per group:
    (group, n_units, mix_share[, sample_rate, expected_units]).

    With ``budget`` (target total units), sample_rate = min(1,
    budget·share / mass) — the per-group hash-sampling rate that hits the
    budget at the temperature mixture, capped at full take for groups too
    small to fill their slot (expected_units then reports the shortfall
    honestly; redistribute by re-planning on the uncapped groups if the
    budget is hard). Feed the rates straight into `mix_corpus` /
    `hash_fraction_sample`.

    Dataflow at 100 TB: one map-side-combined aggregate to per-group
    masses (group cardinality rows), a 1-row total broadcast — the plan
    is corpus-scan bound, the planning math is free."""
    m = df.groupBy(group_col).agg(
        F.sum(F.col(mass_col).cast("double")).alias("_t")
    )
    powed = F.pow(F.col("_t"), F.lit(float(alpha)))
    g = m.select(group_col, "_t", powed.alias("_p"))
    tot = g.agg(F.sum("_p").alias("_tp"))
    out = g.crossJoin(F.broadcast(tot))
    share = F.col("_p") / F.col("_tp")
    cols = [
        F.col(group_col),
        F.round(F.col("_t"), 6).alias("n_units"),
        F.round(share, 6).alias("mix_share"),
    ]
    if budget is not None:
        # a zero-mass group has share 0 and NOTHING to sample — guard the
        # 0/0 explicitly: ANSI mode raises DIVIDE_BY_ZERO, non-ANSI yields
        # NULL which least() would skip, silently promoting the group to
        # sample_rate=1.0
        rate = F.when(
            F.col("_t") > 0,
            F.least(F.lit(1.0), F.lit(float(budget)) * share / F.col("_t")),
        ).otherwise(F.lit(0.0))
        cols += [
            F.round(rate, 6).alias("sample_rate"),
            F.round(F.col("_t") * rate, 6).alias("expected_units"),
        ]
    return out.select(*cols)
