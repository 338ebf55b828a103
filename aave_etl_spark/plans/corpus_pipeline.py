"""The daily TRAINING-CORPUS asset graph: the LLM-side twin of the
financial events pipeline (plans/events_pipeline.py), run entirely
through the orchestration layer (plans/orchestration.py) and the
TableStore.

Each day's batch flows landing → dedup-against-the-corpus → quality/
language gate → greedy packing, with the corpus STATE (content digests,
document texts, and the at-rest MinHash band index) maintained
incrementally per day — the daily-ingest shape a 100 TB pretraining
corpus actually runs, where re-scanning the accumulated corpus per batch
is the thing the at-rest state exists to avoid:

- ``corpus_landing``   (DAILY, day-partitioned): the day's raw batch.
- ``corpus_clean``     (DAILY, day-partitioned): within-batch exact
  dedup (min doc_id per content digest), WITHIN-BATCH near-dup (the
  day's batch banded against itself, exact-Jaccard verify, keep the
  lowest id of every verified pair — two same-day paraphrases must not
  both survive; round-12), cross-CORPUS exact dedup (anti-join against
  the at-rest digest table), cross-CORPUS near-dup
  (minhash_index_match against the at-rest band index → exact-Jaccard
  verify against only the MATCHED corpus docs → drop verified dups),
  then SPAN-level dedup (round 13): every 8-token window already
  canonical in the prior-day corpus (the at-rest ``corpus_spans``
  state) or duplicated within the batch is cut and the doc rebuilt —
  cross-day boilerplate collapses to its first-ever occurrence, the
  Lee et al. 2022 "except one" rule with the keeper AT REST.
  The corpus side of the match reads bucketed on band_key — zero
  exchange, zero re-shingle of history; only the day's batch hashes
  (once — the within-batch and cross-corpus verifies share one batch
  shingle frame); the span state reads bucketed on the window hash,
  skinny keeper rows, never corpus text.
- ``corpus_state``     (DAILY, side-effect): appends the day's
  survivors to ``corpus_digests`` + ``corpus_docs`` (day-partitioned —
  re-running a day dynamic-overwrites exactly its slice), their span-
  window canonical occurrences into ``corpus_spans`` (hash-absent-only,
  so earlier-day keepers always win and re-runs append zero rows), and
  incrementally appends their bands into the ``corpus_mh`` index
  (built on the first non-empty day; append proven equal to a
  from-scratch rebuild in tests/test_operators.py; ``if_absent``
  anti-join makes BYTE-IDENTICAL re-run appends a no-op, so the index
  row count is fixed under plain backfill re-runs. A CORRECTED re-run
  appends the corrected docs' new bands while their old-text bands stay
  — stale bands are harmless for matching (candidate pairs are scoped
  to prior-day corpus ids and the verify reads current text), but
  storage grows under repeated corrections: rebuild the index with
  ``minhash_index_build`` over ``corpus_docs`` to reclaim it).
- ``corpus_doc_buckets`` (DAILY, day-partitioned): the day's per-doc
  hashed-ngram bucket counts — the one gram-explode pass per day,
  materialized because both the distribution state and the gate's
  scoring consume it.
- ``corpus_dsir_state`` (DAILY, day-partitioned): the day's MERGEABLE
  DSIR distribution state — bucket counts rolled to target + raw,
  at most ``DSIR_M`` rows/day. Sums over days == a from-scratch count
  over the accumulated corpus (certified: llm_corpus_dsir_state).
- ``corpus_postings_hh`` (DAILY, day-partitioned): per-(day, shard)
  document-frequency heavy-hitter states over the day's clean slice —
  kilobytes/day, mergeable to the corpus stop list with honest bounds.
- ``corpus_stopterms`` (UNPARTITIONED): the data-planned stop-term
  list rolled up at rest from every stored df sketch — retrieval over
  the growing corpus plans its stop terms from state, never postings.
- ``corpus_eval_shingles`` (DAILY cadence, unpartitioned full-refresh
  table): the benchmark-decontamination state — distinct shingle
  digests of the injected ``benchmarks`` eval set (skinny, text never
  stored); empty when no eval set is injected. Runs in the DAILY phase
  so the day's contamination check reads this run's eval version.
- ``corpus_contam``    (DAILY, day-partitioned): per-doc shingle-set
  overlap of the day's clean slice against the stored eval digests,
  with ``flagged`` = ratio >= ``CONTAM_MAX_RATIO`` — GPT-3/Pile-style
  n-gram decontamination run AT INGEST; only the batch is ever
  shingled, the digest state broadcasts.
- ``corpus_lm_state``  (DAILY, day-partitioned): the day's stupid-
  backoff LM count state (Brants et al. 2007) over the clean slice —
  unigram + bigram ``(w1, w2, tf)`` rows, ADDITIVE across days, the
  corpus's rolling reference LM.
- ``corpus_lm_quality`` (DAILY, day-partitioned): CCNet-style LM
  quality (Wenzek et al. 2020) of the day's clean slice scored by
  stupid-backoff NLL against the LM rolled up from STRICTLY PRIOR
  days, bucketed head/middle/tail per (day, lang); the first ingest
  day (no reference LM yet) emits zero rows. Informational by default;
  with the ``lm_tail_drop`` resource the gate bars tail-bucket docs —
  the CCNet keep made ACTIONABLE, like ``dsir_keep_frac`` for DSIR.
- ``corpus_gated``     (DAILY, day-partitioned): quality_score +
  language_id gate over the day's clean slice (quality >= 0.5 and a
  confident language guess, contamination-flagged docs barred), token
  counts attached, plus each doc's DSIR importance weight against the
  corpus-so-far distribution rolled up from the stored per-day states
  (no text rescan). With the optional ``dsir_keep_frac`` resource the
  weight becomes ACTIONABLE (round 12): a deterministic Gumbel-top-k
  keep of ceil(frac·N) survivors ∝ exp(weight/T) — importance
  RESAMPLING against the accumulated distribution, not just scoring.
- ``corpus_packed``    (DAILY, day-partitioned): greedy first-fit
  packing of the day's gated docs into 256-token budgets per language.
- ``corpus_stats``     (UNPARTITIONED): per-(day, lang) doc/token/pack
  rollup over every day written so far — the datamart head.
- ``corpus_shards``    (UNPARTITIONED): the training-shard MANIFEST —
  every packed doc's reproducible (shard, position) under the seed-keyed
  epoch shuffle with loader metadata; the artifact the data loaders
  read, derived from (seed, n_shards) alone.

Certified end-to-end (two days, planted cross-day exact replicas and
near-dup variants) against one chained-CTE DuckDB oracle in
queries/llm.py ``llm_corpus_pipeline_run``.

Scale: every per-day asset reads only its partition's slice
(partition-pruned — K3); the corpus-sized state is touched only through
the digest anti-join (broadcast of the BATCH side against the stored
digests scan) and the bucketed band join (exchange-free corpus side);
nothing re-shingles or re-reads accumulated text except the verify
stage's equi-join on exactly the matched candidate ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from aave_etl_spark.localframe import local_df
from aave_etl_spark.operators import dedup, packing, sampling
from aave_etl_spark.operators import text as text_ops
from aave_etl_spark.plans.orchestration import (
    DAILY,
    UNPARTITIONED,
    Asset,
    AssetContext,
    AssetGraph,
)

#: DSIR hashed-ngram bucket count (the mergeable distribution state)
DSIR_M = 64
#: the importance-weighting target slice of the corpus
DSIR_TARGET = "lang = 'en'"
#: Gumbel-top-k temperature for the OPTIONAL gate resample (the
#: ``dsir_keep_frac`` resource) — keep ∝ exp(weight / T)
DSIR_TEMPERATURE = 1.0
#: per-(day, shard) heavy-hitter width / rolled-up stop-list length
STOP_M, STOP_K, STOP_SHARDS = 16, 5, 2
#: a doc whose shingle-set overlap with the eval set reaches this ratio
#: is benchmark-contaminated and barred from the training corpus
CONTAM_MAX_RATIO = 0.2
#: training-shard emission: loader worker count and the epoch seed
#: (re-sharding an epoch is a new seed, never a data move)
SHARD_N, SHARD_SEED = 4, "epoch0"
#: span-level dedup window length (normalized tokens) — the Lee et al.
#: 2022 substring-dedup granularity, shared by the in-flight rewrite and
#: the at-rest corpus_spans canonical-occurrence state
SPAN_N = 8
#: stupid-backoff LM (Brants et al. 2007): backoff multiplier, and the
#: CCNet head/middle cumulative cut points over each day's per-language
#: score ranks (literal cuts — never summed at runtime, the IEEE
#: 0.3 + 0.3 != 0.6 trap perplexity_buckets documents)
LM_ALPHA, LM_CUT1, LM_CUT2 = 0.4, 0.3, 0.6
#: BPE merge-table size learned by corpus_maintenance (the tokenizer
#: artifact stored as ``corpus_bpe_merges``)
BPE_MERGES = 16


def _corpus_landing(ctx: AssetContext) -> DataFrame:
    """The day's raw batch from the injected landing feed (the transport
    resource, like the events pipeline's injected ``events``). A landing
    row without text is not a document — NULL texts are dropped here so
    every downstream digest/shingle is non-NULL (a NULL digest would
    silently escape the anti-join dedup forever)."""
    feed = ctx.resources["landing"]
    return feed.where(
        (F.col("day") == F.lit(ctx.partition.date).cast("date"))
        & F.col("text").isNotNull()
    )


# typed-empty schemas for upstream reads: a day whose asset produced no
# rows was never written (TableStore.write skips empties), and a plain
# read of a missing table is a ZERO-COLUMN frame — downstream selects
# must still resolve (plans/orchestration.py upstream() contract)
def _schema(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t(), True) for n, t in fields])


_LANDING_SCHEMA = _schema(
    ("doc_id", LongType), ("lang", StringType), ("text", StringType),
    ("day", DateType),
)
_CLEAN_SCHEMA = _schema(
    ("day", DateType), ("doc_id", LongType), ("lang", StringType),
    ("text", StringType),
)
_GATED_SCHEMA = _schema(
    ("day", DateType), ("doc_id", LongType), ("lang", StringType),
    ("n_tokens", LongType), ("dsir_weight", DoubleType),
)
_DOCB_SCHEMA = _schema(
    ("day", DateType), ("doc_id", LongType), ("lang", StringType),
    ("b", LongType), ("c", LongType),
)
_DSIR_STATE_SCHEMA = _schema(
    ("day", DateType), ("b", LongType), ("n_target", LongType),
    ("n_raw", LongType),
)
_HH_STATE_SCHEMA = StructType(
    [
        StructField("_corpus", StringType(), True),
        StructField("_shard", StringType(), True),
        StructField(
            "hh",
            ArrayType(
                StructType(
                    [
                        StructField("_v", StringType(), True),
                        StructField("_c", LongType(), True),
                    ]
                )
            ),
            True,
        ),
        StructField("rest_max", LongType(), True),
        StructField("hh_m", IntegerType(), True),
        StructField("day", DateType(), True),
    ]
)
_PACKED_SCHEMA = _schema(
    ("day", DateType), ("lang", StringType), ("doc_id", LongType),
    ("n_tokens", LongType), ("pack_id", LongType), ("pack_offset", LongType),
)
_LM_STATE_SCHEMA = _schema(
    ("day", DateType), ("w1", StringType), ("w2", StringType),
    ("tf", LongType),
)
_LM_QUALITY_SCHEMA = _schema(
    ("day", DateType), ("doc_id", LongType), ("n_tokens", LongType),
    ("avg_neg_logprob", DoubleType), ("bucket", StringType),
)
_EVAL_SCHEMA = _schema(("shingle_digest", StringType))
_CONTAM_SCHEMA = StructType(
    [
        StructField("day", DateType(), True),
        StructField("doc_id", LongType(), True),
        StructField("n_shingles", LongType(), True),
        StructField("n_overlap", LongType(), True),
        StructField("contamination_ratio", DoubleType(), True),
        StructField("flagged", BooleanType(), True),
    ]
)


def _corpus_clean(ctx: AssetContext) -> DataFrame:
    """Dedup the day's batch within itself and against the CORPUS state."""
    batch = ctx.upstream(
        "corpus_landing", this_partition_only=True, date_col="day",
        schema=_LANDING_SCHEMA,
    )
    digest = F.md5(dedup.normalize_text("text"))
    # within-batch exact: first occurrence (min doc_id) per content digest
    # — agg+join, NOT a window over the digest: a dup-storm day would
    # funnel every copy into one window task (dedup.keep_first_by_digest)
    batch = dedup.keep_first_by_digest(batch, digest)
    # within-batch NEAR-dup: band the day's batch against itself (same
    # minhash geometry as the at-rest index: 3-shingles, 8 hashes, 2 rows
    # per band) and drop the HIGHER id of every exact-Jaccard-verified
    # pair — two same-day paraphrases must not BOTH enter corpus state
    # and packing, the hole the cross-corpus band index (prior days only)
    # cannot close. Deterministic keep-lowest: a doc is dropped iff SOME
    # lower-id batch doc verifies against it, the same rule the DuckDB
    # oracle states as `id IN (SELECT id_b FROM verified)`. Scale shape:
    # a storm of IDENTICAL docs already collapsed in the exact pass
    # upstream; a storm of k distinct PARAPHRASES resolves in the
    # two-phase existential form (probe bucket minima first, all-pairs
    # only for the unresolved remainder — O(k) instead of O(k²) verifies
    # on a storm, answer identical; dedup.within_batch_near_dup_drops,
    # SCALE.md row)
    # consumed twice (the within-batch verify here, the cross-corpus
    # verify below reuses it as the batch side): cut the lineage so the
    # batch shingles once per day
    sh_b = dedup.word_shingles(
        batch.select("doc_id", "text"), n=3
    ).localCheckpoint(eager=False)
    wdups = dedup.within_batch_near_dup_drops(sh_b, threshold=0.5)
    batch = batch.join(wdups, "doc_id", "left_anti")
    store = ctx.store
    # state reads are scoped to STRICTLY EARLIER days (partition-pruned):
    # a day's batch must never dedup against the day's OWN previous run —
    # re-running a corrected batch would otherwise anti-join every
    # unchanged doc against its own stored digest and silently empty the
    # slice (the backfill case the module exists to support)
    prior = f"day < DATE '{ctx.partition.date}'"
    # cross-corpus exact: content already accepted on an earlier day loses
    if store.exists("corpus_digests"):
        seen = store.read("corpus_digests", where=prior).select("digest")
        batch = batch.join(seen, digest == F.col("digest"), "left_anti")
    # cross-corpus near-dup: LSH match against the at-rest band index,
    # exact-Jaccard verify restricted to the matched corpus docs only
    if store.exists("corpus_mh"):
        pairs = dedup.minhash_index_match(store, batch, "corpus_mh")
        # scope the CANDIDATE PAIRS themselves to prior-day corpus ids —
        # not just the verify text. The band index can carry same-day
        # rows from a prior run of this day (under the SAME ids as the
        # current batch), and the verify shingle frame below unions the
        # batch's texts: an unscoped same-day pair would borrow batch-side
        # text for its "corpus" id and verify at the TRUE jaccard, so two
        # near-dup batch docs that both survived the first run would drop
        # EACH OTHER on a re-run (round-10 ADVICE; re-run idempotence with
        # planted in-batch near-dups is pytest-gated in
        # tests/test_orchestration.py)
        # schema-guarded: corpus_mh can exist while corpus_docs was never
        # written (an empty first day builds the index table but the
        # empty-skip in TableStore.write skips the docs table) — a
        # schema-less read would come back zero-column and crash the
        # select, wedging every later day
        prior_docs = store.read(
            "corpus_docs", where=prior, schema=_CLEAN_SCHEMA
        ).select("doc_id", "text")
        pairs = pairs.join(
            prior_docs.select(F.col("doc_id").alias("corpus_id")),
            "corpus_id",
            "left_semi",
        )
        # shingle ONLY the matched corpus docs (semi-join on the candidate
        # ids), never the accumulated corpus — the verify cost is
        # |candidates| x avg-shingles, not corpus-linear
        matched = pairs.select(F.col("corpus_id").alias("doc_id")).distinct()
        corpus_docs = prior_docs.join(matched, "doc_id")
        # batch ids and corpus ids are disjoint by construction (fresh ids
        # per day), so one shingle frame serves both sides of the verify.
        # The batch side reuses sh_b (shingled once above): it carries the
        # within-batch-dropped ids too, but the verify equi-joins on the
        # PAIRS' ids and pairs come from the surviving batch only
        # the union feeds jaccard_verify's three consumers (sizes + both
        # join sides): cut so the matched-corpus shingling runs once
        sh = sh_b.unionByName(
            dedup.word_shingles(corpus_docs, n=3)
        ).localCheckpoint(eager=False)
        dups = dedup.jaccard_verify(
            sh,
            pairs.selectExpr("new_id AS id_a", "corpus_id AS id_b"),
            threshold=0.5,
        )
        batch = batch.join(
            dups.select(F.col("id_a").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
    # SPAN-level dedup (round 13 — the dedup ladder's last rung, now WITH
    # at-rest state): cut every SPAN_N-token window that is (a) already
    # canonical in the prior-day corpus — the stored corpus_spans keeper
    # wins at every batch occurrence, so cross-DAY boilerplate (the same
    # header/footer re-crawled every day, Lee et al. 2022's motivating
    # case) collapses to its first-ever occurrence — or (b) duplicated
    # within the batch, where the first (doc, offset) survives. Docs with
    # nothing cut pass through BYTE-IDENTICAL; a doc with cuts is rebuilt
    # from its surviving tokens in normalized token space (the operator's
    # contract — the digest/shingle/token features downstream are
    # normalization-invariant, so only the stored text bytes change).
    # The state read is prior-day-scoped like every other state read (a
    # re-run must not cut the day's batch against its own prior run) and
    # bucketed on the window hash, so the match join is exchange-free on
    # the stored side and NEVER re-reads corpus text.
    prior_spans = None
    if store.exists("corpus_spans"):
        prior_spans = store.read_bucketed("corpus_spans").where(prior)
    rw = dedup.span_dedup_rewrite(batch, n=SPAN_N, prior_spans=prior_spans)
    batch = batch.join(
        rw.select("doc_id", "n_removed", "text_deduped"), "doc_id"
    ).select(
        "day",
        "doc_id",
        "lang",
        F.when(F.col("n_removed") > 0, F.col("text_deduped"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return batch.select("day", "doc_id", "lang", "text")


def _corpus_state(ctx: AssetContext) -> DataFrame:
    """Side-effect asset: fold the day's survivors into the corpus state
    (digest table, document table, MinHash band index).

    DECONTAMINATION STATE DISCIPLINE (deliberate, pytest-pinned in
    tests/test_orchestration.py): state folds from ``corpus_clean`` —
    UPSTREAM of the contamination gate — so a benchmark-contaminated doc
    is barred from gating/packing (it never trains) but its digest,
    text, and bands DO enter the dedup state. That is the correct
    trade: future copies and paraphrases of the leaked text then
    anti-join/band-match against it and are dropped as duplicates at
    ingest, instead of each re-arriving copy surviving to the contam
    check forever (and, should the eval set ever be retired, silently
    entering the corpus). The cost is that leaked-benchmark TEXT
    persists in ``corpus_docs``; a deployment that must purge it runs
    ``corpus_maintenance`` after deleting the rows — the band index
    rebuild reclaims their bands."""
    clean = ctx.upstream(
        "corpus_clean", this_partition_only=True, date_col="day",
        schema=_CLEAN_SCHEMA,
    )
    store = ctx.store
    digests = clean.select(
        "day", "doc_id", F.md5(dedup.normalize_text("text")).alias("digest")
    )
    wrote = store.write(digests, "corpus_digests", partition_cols=["day"])
    store.write(
        clean.select("day", "doc_id", "lang", "text"),
        "corpus_docs",
        partition_cols=["day"],
    )
    if not wrote:
        # empty day: nothing to fold. In particular, do NOT create the
        # band index for an empty batch — write_bucketed has no empty-skip
        # and a phantom index table (with no corpus_docs beside it) is a
        # trap for every later day's reads
        return digests
    if store.exists("corpus_mh"):
        # if_absent: a backfill re-run of this day re-appends the same
        # survivors' bands — the anti-join makes that a no-op, so N
        # re-runs leave the index row count FIXED (pytest-gated in
        # tests/test_orchestration.py) instead of accreting stale rows.
        # The day predicate scopes the anti-join's index read to THIS
        # day's slice (stale rows can only come from a prior run of the
        # same day — ids are day-fresh), so the idempotence check costs
        # the batch, never the accumulated index
        dedup.minhash_index_append(
            store, clean, "corpus_mh", carry_cols=("day",),
            if_absent=True,
            if_absent_where=f"day = DATE '{ctx.partition.date}'",
        )
    else:
        dedup.minhash_index_build(store, clean, "corpus_mh", carry_cols=("day",))
    # span-window canonical state (round 13): the day's REWRITTEN
    # survivors' per-hash first occurrences — append is hash-absent-only,
    # so stored (earlier-day) keepers always win and a byte-identical
    # re-run appends zero rows (no day predicate needed: unlike bands,
    # a hash already present from ANY day means the batch occurrence is
    # non-canonical by rule). Stale rows from corrected backfills are
    # reclaimed by corpus_maintenance's rebuild, the band-index contract.
    if store.exists("corpus_spans"):
        dedup.span_index_append(
            store, clean, "corpus_spans", n=SPAN_N, carry_cols=("day",)
        )
    else:
        dedup.span_index_build(
            store, clean, "corpus_spans", n=SPAN_N, carry_cols=("day",)
        )
    return digests


def _corpus_doc_buckets(ctx: AssetContext) -> DataFrame:
    """Per-doc hashed unigram+bigram bucket counts for the day's clean
    slice — ``(day, doc_id, lang, b, c)``. The gram explode is the
    heaviest per-day text pass, and BOTH the day's distribution state and
    the gate's importance scoring need the same frame: materializing it
    once as a (batch-sized, day-partitioned) asset runs the explode once
    per day instead of once per consumer (the localCheckpoint discipline
    from dsir_importance_resample, asset-shaped)."""
    clean = ctx.upstream(
        "corpus_clean", this_partition_only=True, date_col="day",
        schema=_CLEAN_SCHEMA,
    )
    buckets = sampling.hashed_ngram_buckets(
        clean, m=DSIR_M, extra_cols=("day", "lang")
    )
    return buckets.select(
        "day", "doc_id", "lang",
        F.col("_b").cast("long").alias("b"), F.col("_c").cast("long").alias("c"),
    )


def _corpus_dsir_state(ctx: AssetContext) -> DataFrame:
    """Per-day MERGEABLE DSIR distribution state: the day's bucket counts
    rolled to target (``DSIR_TARGET``) and raw — ``(day, b, n_target,
    n_raw)``, at most ``DSIR_M`` rows per day. Bucket counts are sums, so
    rolling stored per-day states up (``sum GROUP BY b``) equals a
    from-scratch count over the accumulated corpus: the gate importance-
    weights any day's batch against the whole corpus distribution by
    reading kilobytes of state, never rescanning text (the HH/KMV at-rest
    sketch pattern applied to DSIR)."""
    buckets = ctx.upstream(
        "corpus_doc_buckets", this_partition_only=True, date_col="day",
        schema=_DOCB_SCHEMA,
    )
    return (
        buckets.groupBy("day", "b")
        .agg(
            F.sum(F.when(F.expr(DSIR_TARGET), F.col("c")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_target"),
            F.sum("c").cast("long").alias("n_raw"),
        )
        .select("day", "b", "n_target", "n_raw")
    )


def _corpus_eval_shingles(ctx: AssetContext) -> DataFrame:
    """The benchmark-decontamination state: distinct shingle DIGESTS of
    the injected eval set (``benchmarks`` resource — (doc_id, text) rows
    of every benchmark the lab evaluates on). Digests, not text: the
    state table is skinny (16 bytes/shingle), benchmark text never lands
    in the training store, and the probe side joins on a fixed-width
    key. Eval sets are small and versioned — the asset full-refreshes
    each run; with no ``benchmarks`` resource the asset is empty and the
    contamination gate passes everything (the certification harness's
    default). Because ``TableStore.write`` SKIPS empty frames, "empty"
    must be expressed as an explicit DROP of the stored table: on an
    existing store whose earlier runs had a benchmarks resource, the
    empty-write skip alone would leave the PRIOR eval digests in place
    and ``corpus_contam`` would keep flagging against STALE benchmarks
    (round-11 ADVICE; pytest-gated in tests/test_orchestration.py)."""
    bench = ctx.resources.get("benchmarks")
    if bench is None:
        ctx.store.drop("corpus_eval_shingles")
        # the per-doc stats table goes with it: its rows are overlap
        # ratios against the now-retired eval set, and a re-run day's
        # empty contam frame is skipped by write — leaving a stale
        # flagged=true slice that would keep barring docs from the gate.
        # The stats are recomputable from corpus_clean + a future eval
        # set; "no benchmarks" means NO contamination state, not frozen
        # old state
        ctx.store.drop("corpus_contam")
        return local_df(ctx.spark, [], _EVAL_SCHEMA)
    return (
        dedup.word_shingles(bench.select("doc_id", "text"), n=3)
        .select(F.md5("shingle").alias("shingle_digest"))
        .distinct()
    )


def _corpus_contam(ctx: AssetContext) -> DataFrame:
    """Per-doc benchmark contamination of the day's clean slice: how much
    of each doc's shingle SET appears in the stored eval digests —
    (day, doc_id, n_shingles, n_overlap, contamination_ratio, flagged).
    The GPT-3/Pile-style n-gram decontamination gate, run AT INGEST so a
    leaked benchmark never enters the corpus (instead of an after-the-
    fact audit over 100 TB).

    Scale shape: only the DAY'S BATCH is ever shingled; the eval state is
    a distinct-digest table (vocabulary-of-the-benchmarks-sized) that
    broadcasts into a semi-join — no doc x doc pairs, immune to
    hot-shingle fan-out (the cross_split_contamination shape,
    operators/dedup.py:380, with the train side replaced by at-rest
    state)."""
    # no eval state (no benchmarks injected -> the empty write skipped the
    # table): decontamination is disabled — return a typed empty instead
    # of paying a per-day shingle pass to compute all-zero stats
    if not ctx.store.exists("corpus_eval_shingles"):
        return local_df(ctx.spark, [], _CONTAM_SCHEMA)
    clean = ctx.upstream(
        "corpus_clean", this_partition_only=True, date_col="day",
        schema=_CLEAN_SCHEMA,
    )
    eval_sh = ctx.store.read("corpus_eval_shingles", schema=_EVAL_SCHEMA)
    sh = dedup.word_shingles(clean.select("doc_id", "text"), n=3).select(
        "doc_id", F.md5("shingle").alias("shingle_digest")
    )
    tot = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    ov = (
        sh.join(F.broadcast(eval_sh), "shingle_digest", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_n_overlap"))
    )
    ratio = F.coalesce("_n_overlap", F.lit(0)).cast("double") / F.col(
        "n_shingles"
    ).cast("double")
    return (
        tot.join(ov, "doc_id", "left")
        .select(
            F.lit(ctx.partition.date).cast("date").alias("day"),
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.coalesce("_n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.round(ratio, 6).alias("contamination_ratio"),
            (ratio >= F.lit(CONTAM_MAX_RATIO)).alias("flagged"),
        )
    )


def _corpus_lm_state(ctx: AssetContext) -> DataFrame:
    """The day's stupid-backoff LM count state over the clean slice:
    ``(day, w1, w2 NULL for unigrams, tf)`` — the corpus's rolling
    reference LM (Brants et al. 2007), maintained exactly like the DSIR
    distribution state: counts are ADDITIVE, so the LM "as of" any day
    is a sum over stored day slices, and a corrected backfill re-run
    dynamic-overwrites its own day partition with no cross-day repair
    (no hash-absent subtlety — unlike the span state there is no keeper
    to preserve). Per-day cost is batch-bound (one tokenize + explode of
    the DAY's clean text); the rolled-up table the scorer reads grows
    with DISTINCT grams, which saturates sublinearly (Heaps' law), not
    with corpus bytes."""
    clean = ctx.upstream(
        "corpus_clean", this_partition_only=True, date_col="day",
        schema=_CLEAN_SCHEMA,
    )
    return text_ops.ngram_counts(clean, text_col="text").select(
        F.lit(ctx.partition.date).cast("date").alias("day"), "w1", "w2", "tf"
    )


def _corpus_lm_quality(ctx: AssetContext) -> DataFrame:
    """CCNet-style LM quality of the day's clean slice (Wenzek et al.
    2020 §4.4): each doc scored by stupid-backoff NLL against the
    REFERENCE LM rolled up from days STRICTLY BEFORE the current one —
    CCNet scores against a fixed pretrained LM, and the strict-past
    scope keeps the backoff branches real (a same-day fold would put
    every batch gram in the LM and no bigram would ever back off) and
    the day idempotent under re-runs (a day's scores never depend on
    its own state write). Output: ``(day, doc_id, n_tokens,
    avg_neg_logprob, bucket)`` with head/middle/tail cut at the
    LM_CUT1/LM_CUT2 percent-ranks per (day, lang) — CCNet keeps
    head+middle for pretraining. The FIRST ingest day has no reference
    LM yet and emits zero rows (no degenerate all-OOV scores against an
    empty vocabulary): expressed as scores over a NULL corpus total all
    folding to NULL and filtered, so the guard costs no eager action.

    Scale: scoring is three equi-joins of the day's token stream
    against the vocab-sized rolled state (operators/text.py
    stupid_backoff_score plan notes); the bucket window partitions by
    (day's batch x language) — for a day batch too large to window,
    swap the percent_rank for the two percentile_approx thresholds
    exactly as perplexity_buckets(approximate=True) does (same
    head/middle/tail semantics at epsilon boundary slop).

    Certified (counts state + day-2 scores + buckets vs a from-scratch
    DuckDB derivation): queries/llm.py ``llm_corpus_lm``."""
    from pyspark.sql.window import Window

    clean = ctx.upstream(
        "corpus_clean", this_partition_only=True, date_col="day",
        schema=_CLEAN_SCHEMA,
    )
    state = ctx.store.read(
        "corpus_lm_state",
        where=f"day < DATE '{ctx.partition.date}'",
        schema=_LM_STATE_SCHEMA,
    )
    counts = state.groupBy("w1", "w2").agg(F.sum("tf").alias("tf"))
    # OPTIONAL count cutoff (the ``lm_min_tf`` resource): drop rolled
    # grams with tf below the threshold — Brants et al. 2007 §4.2's own
    # remedy for count-state growth (singleton grams dominate an
    # open-vocabulary web corpus and contribute least to scores).
    # Stupid backoff degrades GRACEFULLY under pruning by construction:
    # a pruned bigram backs off to alpha * S(unigram), a pruned unigram
    # to the alpha/N OOV floor — scores shift only where counts were
    # thinnest. Off (the default) the certified full-count path runs.
    min_tf = ctx.resources.get("lm_min_tf")
    if min_tf is not None:
        counts = counts.filter(F.col("tf") >= int(min_tf))
    scored = text_ops.stupid_backoff_score(
        clean, counts, text_col="text", alpha=LM_ALPHA
    ).filter(F.col("avg_neg_logprob").isNotNull())
    withlang = scored.join(clean.select("doc_id", "lang"), "doc_id")
    # rank on the ROUNDED score (the output value), doc_id tiebreak —
    # deterministic and engine-portable by construction
    pr = F.percent_rank().over(
        Window.partitionBy("lang").orderBy("avg_neg_logprob", "doc_id")
    )
    bucket = (
        F.when(pr < F.lit(LM_CUT1), "head")
        .when(pr < F.lit(LM_CUT2), "middle")
        .otherwise("tail")
    )
    return withlang.select(
        F.lit(ctx.partition.date).cast("date").alias("day"),
        "doc_id",
        "n_tokens",
        "avg_neg_logprob",
        bucket.alias("bucket"),
    )


def _corpus_gated(ctx: AssetContext) -> DataFrame:
    """Quality + language gate over the day's clean slice, with the DSIR
    importance weight of every surviving doc attached — computed against
    the ACCUMULATED corpus distribution (days <= current) rolled up from
    the stored per-day bucket-count states, so the gate is
    distribution-aware without rescanning a byte of prior text. The
    weight is informational by default (selection semantics unchanged);
    rolled-state == from-scratch-rescan equality is certified in
    queries/llm.py ``llm_corpus_dsir_state``."""
    clean = ctx.upstream(
        "corpus_clean", this_partition_only=True, date_col="day",
        schema=_CLEAN_SCHEMA,
    )
    q = text_ops.quality_score(clean, text_col="text")
    lid = text_ops.language_id(clean, text_col="text")
    # corpus-so-far distribution: m-row rollup of the stored day states
    # (the current day's state is written upstream of this asset)
    state = ctx.store.read(
        "corpus_dsir_state",
        where=f"day <= DATE '{ctx.partition.date}'",
        schema=_DSIR_STATE_SCHEMA,
    )
    dist = state.groupBy(F.col("b").alias("_b")).agg(
        F.sum("n_target").alias("_ct"), F.sum("n_raw").alias("_cr")
    )
    ratio = sampling.dsir_log_ratio(
        dist.select("_b", "_ct"), dist.select("_b", "_cr"), DSIR_M
    )
    # the day's per-doc buckets come from the materialized asset — the
    # gram explode already ran once for the state; never re-run it here
    doc_buckets = ctx.upstream(
        "corpus_doc_buckets", this_partition_only=True, date_col="day",
        schema=_DOCB_SCHEMA,
    ).select("doc_id", F.col("b").alias("_b"), F.col("c").alias("_c"))
    # the UNROUNDED weight rides along: the optional resample below
    # derives its Gumbel-top-k key from it (rounding first would compound
    # into the key — the dsir_scores output-boundary discipline)
    scores = sampling.dsir_scores(doc_buckets, ratio).select(
        "doc_id", F.col("_w").alias("_wraw"), F.round("_w", 6).alias("dsir_weight")
    )
    # benchmark decontamination: a doc the contam asset flagged (shingle
    # overlap with the stored eval digests >= CONTAM_MAX_RATIO) is barred
    # from the corpus — the flag side is batch-sized, AQE broadcasts it
    flagged = ctx.upstream(
        "corpus_contam", this_partition_only=True, date_col="day",
        schema=_CONTAM_SCHEMA,
    ).filter("flagged").select("doc_id")
    gated = (
        clean.join(q, "doc_id")
        .join(lid.select("doc_id", "lang_guess"), "doc_id")
        .join(scores, "doc_id", "left")
        .join(flagged, "doc_id", "left_anti")
        .filter("quality >= 0.5 AND lang_guess <> 'und'")
        .select(
            "day",
            "doc_id",
            "lang",
            F.size(text_ops.tokens("text")).cast("long").alias("n_tokens"),
            "dsir_weight",
            "_wraw",
        )
    )
    # OPTIONAL CCNet keep (the ``lm_tail_drop`` resource, round 13): bar
    # the day's TAIL-bucket docs — CCNet pretrains on head+middle and
    # discards the tail (Wenzek et al. 2020 §4.4), and the LM quality
    # asset computes exactly that bucketing against the rolling reference
    # LM. The anti-join runs BEFORE the DSIR resample below so a keep
    # fraction applies to LM-surviving docs. Day 1 (no reference LM yet,
    # zero quality rows) bars nothing — scoring starts when the LM does.
    # Off (the default) the bucket stays informational.
    if ctx.resources.get("lm_tail_drop"):
        tail = (
            ctx.upstream(
                "corpus_lm_quality", this_partition_only=True, date_col="day",
                schema=_LM_QUALITY_SCHEMA,
            )
            .filter("bucket = 'tail'")
            .select("doc_id")
        )
        gated = gated.join(tail, "doc_id", "left_anti")
    # OPTIONAL importance-weighted keep (the ``dsir_keep_frac`` resource,
    # round 12): Gumbel-top-k over the day's gate survivors — keep the
    # ceil(frac·N) largest keys, i.e. sample without replacement
    # ∝ exp(weight/T) against the corpus-so-far distribution the stored
    # states rolled up. Off (the default) the weight stays informational
    # and selection semantics are unchanged. The exact rank runs in the
    # DISTRIBUTED form (sampling.global_desc_rank — range-partitioned
    # local ranks + broadcast offsets; no partition-less window, so no
    # single-task funnel even on a 100 TB day batch); a corpus-wide
    # resample can instead take the percentile-threshold form
    # (operators/sampling.py dsir_importance_resample, approximate=True)
    # to save the ranking shuffle at epsilon boundary slop. Gate survivors
    # always carry a non-NULL weight
    # (quality >= 0.5 requires >= 5 words -> >= 5 grams -> buckets).
    # State-vs-scratch key equality is certified in queries/llm.py
    # ``llm_corpus_dsir_resample``.
    keep_frac = ctx.resources.get("dsir_keep_frac")
    if keep_frac is not None:
        keyed = gated.withColumn(
            "_sk",
            sampling.dsir_sample_key(
                F.col("_wraw"), F.col("doc_id"), DSIR_TEMPERATURE
            ),
        )
        total = F.broadcast(
            keyed.agg(F.count(F.lit(1)).cast("double").alias("_n"))
        )
        gated = (
            sampling.global_desc_rank(keyed, "_sk", "doc_id")
            .crossJoin(total)
            .filter(F.col("_rk") <= F.ceil(F.lit(float(keep_frac)) * F.col("_n")))
        )
    return gated.select("day", "doc_id", "lang", "n_tokens", "dsir_weight")


def _corpus_packed(ctx: AssetContext) -> DataFrame:
    """Greedy first-fit packing of the day's gated docs per language."""
    gated = ctx.upstream(
        "corpus_gated", this_partition_only=True, date_col="day",
        schema=_GATED_SCHEMA,
    )
    packed = packing.greedy_pack(
        gated.select("lang", "doc_id", "n_tokens"), capacity=256
    )
    return packed.withColumn(
        "day", F.lit(ctx.partition.date).cast("date")
    ).select("day", "lang", "doc_id", "n_tokens", "pack_id", "pack_offset")


def _corpus_postings_hh(ctx: AssetContext) -> DataFrame:
    """Per-day document-frequency heavy-hitter states over the day's
    clean slice — the retrieval-planning half of the corpus state. A
    distinct (doc, term) incidence is one postings row, so per-(day,
    shard) term counts ARE partial dfs; the exact top-``STOP_M`` summary
    plus its rest_max undercount bound (operators/sketch.py
    topk_sketch_by_group) is kilobytes per day and MERGEABLE: the rolled
    stop list (``corpus_stopterms``) reads stored m-row states, never the
    postings — retrieval over the growing corpus plans its stop terms
    from state, the way the gate plans its DSIR weights."""
    clean = ctx.upstream(
        "corpus_clean", this_partition_only=True, date_col="day",
        schema=_CLEAN_SCHEMA,
    )
    from aave_etl_spark.operators.sketch import topk_sketch_by_group

    toks = clean.select(
        F.lit("all").alias("_corpus"),
        # the day is part of the shard key: per-day states are just more
        # (smaller) parts to the merge, with the same honest bounds
        F.concat_ws(
            ":",
            F.col("day").cast("string"),
            (F.col("doc_id") % STOP_SHARDS).cast("string"),
        ).alias("_shard"),
        F.explode(
            F.array_distinct(F.split(dedup.normalize_text("text"), " "))
        ).alias("term"),
    )
    state = topk_sketch_by_group(toks, ["_corpus", "_shard"], "term", m=STOP_M)
    return state.withColumn("day", F.lit(ctx.partition.date).cast("date"))


def _corpus_stopterms(ctx: AssetContext) -> DataFrame:
    """The corpus's data-planned stop-term list, rolled up AT REST from
    every stored per-(day, shard) df sketch: (value, count_lb, count_ub,
    exact, rank) — top-``STOP_K`` terms by df lower bound. Cost is
    |days x shards| m-row states, independent of corpus size; compose by
    anti-joining a probe's postings against it (operators/text.py
    discover_stop_terms contract)."""
    states = ctx.upstream("corpus_postings_hh", schema=_HH_STATE_SCHEMA)
    from aave_etl_spark.operators.text import stop_terms_from_sketches

    return stop_terms_from_sketches(
        states.select("_corpus", "_shard", "hh", "rest_max", "hh_m"), k=STOP_K
    )


def _corpus_stats(ctx: AssetContext) -> DataFrame:
    """Datamart rollup over every packed day written so far."""
    packed = ctx.upstream("corpus_packed", schema=_PACKED_SCHEMA)
    return packed.groupBy("day", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        (F.max("pack_id") + 1).cast("long").alias("n_packs"),
    )


def _corpus_shards(ctx: AssetContext) -> DataFrame:
    """The training-shard MANIFEST — the artifact a trainer's data
    loaders actually consume: every packed doc assigned a reproducible
    (shard, position) by the seed-keyed epoch shuffle
    (operators/sampling.py epoch_shards: md5(seed:id) shard + two-level
    rank, no global sort, no corpus-wide window), carrying the loader's
    metadata (day, lang, n_tokens, pack_id). Derived entirely from
    (SHARD_SEED, SHARD_N) and the packed corpus — identical on every
    re-run over the same corpus, a new epoch is a new seed, and each of
    the SHARD_N workers reads its shard in `position` order for a
    reproducible global order with no coordination."""
    from aave_etl_spark.operators import sampling

    packed = ctx.upstream("corpus_packed", schema=_PACKED_SCHEMA)
    shards = sampling.epoch_shards(
        packed.select("doc_id"), n_shards=SHARD_N, seed=SHARD_SEED
    )
    return shards.join(
        packed.select("doc_id", "day", "lang", "n_tokens", "pack_id"), "doc_id"
    ).select(
        "shard", "position", "doc_id", "day", "lang", "n_tokens", "pack_id",
        "sort_key",
    )


#: the day-partitioned corpus tables the maintenance pass compacts
_COMPACTABLE = (
    "corpus_digests",
    "corpus_docs",
    "corpus_doc_buckets",
    "corpus_dsir_state",
    "corpus_postings_hh",
    "corpus_clean",
    "corpus_contam",
    "corpus_gated",
    "corpus_packed",
)


def corpus_maintenance(
    store, target_file_bytes: int = 128 * 1024 * 1024
) -> dict[str, tuple[int, int]]:
    """Periodic maintenance for the corpus store — the pass every
    incrementally-loaded lakehouse runs on a cadence:

    - COMPACT each day-partitioned table's accreted small files (every
      daily run writes one file-set per partition; re-runs add more) to
      bounded counts via ``TableStore.compact`` — content-preserving,
      same partition layout.
    - REBUILD the MinHash band index from ``corpus_docs`` — the reclaim
      path for stale bands: corrected backfills append the corrected
      docs' new bands while the old-text bands stay (harmless for
      matching — candidate pairs are prior-day-scoped and the verify
      reads current text — but storage and candidate noise grow under
      repeated corrections). A rebuild over the current docs is exactly
      the from-scratch build the append path is certified equal to.

    Returns ``{table: (before, after)}`` — file counts for compacted
    tables, row counts for the index rebuild. Run it off the daily path
    (weekly, or after a heavy backfill); cost is one scan+rewrite of the
    state tables, never the raw landing data."""
    out: dict[str, tuple[int, int]] = {}
    for name in _COMPACTABLE:
        if store.exists(name):
            out[name] = store.compact(
                name, partition_cols=["day"], target_file_bytes=target_file_bytes
            )
    if store.exists("corpus_mh") and store.exists("corpus_docs"):
        before = store.read("corpus_mh").count()
        dedup.minhash_index_build(
            store, store.read("corpus_docs"), "corpus_mh", carry_cols=("day",)
        )
        out["corpus_mh"] = (before, store.read("corpus_mh").count())
    # the span canonical store gets the same reclaim contract: rebuild
    # from the current docs. carry_cols lead the canonical order, so the
    # multi-day rebuild reproduces the incremental keepers exactly
    # (first day wins — see dedup._span_canonicals) while stale rows
    # from corrected backfills are dropped
    if store.exists("corpus_spans") and store.exists("corpus_docs"):
        before = store.read_bucketed("corpus_spans").count()
        dedup.span_index_build(
            store, store.read("corpus_docs"), "corpus_spans", n=SPAN_N,
            carry_cols=("day",),
        )
        out["corpus_spans"] = (before, store.read_bucketed("corpus_spans").count())
    # the TOKENIZER artifact (round 13): learn the BPE merge table over
    # the accumulated corpus and store it — merges shift as the corpus
    # grows, and retraining belongs on the maintenance cadence, not the
    # daily path (the quantizer-retrain discipline applied to text).
    # bpe_learn scans the docs once, then runs vocab-bound rounds
    # (SCALE.md); the stored table is the rank-ordered artifact
    # bpe_segment consumes
    if store.exists("corpus_docs"):
        before = (
            store.read("corpus_bpe_merges").count()
            if store.exists("corpus_bpe_merges")
            else 0
        )
        merges = text_ops.bpe_learn(
            store.read("corpus_docs"), n_merges=BPE_MERGES
        )
        store.write(merges, "corpus_bpe_merges")
        out["corpus_bpe_merges"] = (
            before, store.read("corpus_bpe_merges").count()
        )
    return out


def corpus_pipeline_graph() -> AssetGraph:
    return AssetGraph(
        [
            Asset(
                name="corpus_landing",
                fn=_corpus_landing,
                group="corpus_lake",
                partitioning=DAILY,
                partition_cols=("day",),
            ),
            Asset(
                name="corpus_clean",
                fn=_corpus_clean,
                deps=("corpus_landing",),
                group="corpus_lake",
                partitioning=DAILY,
                partition_cols=("day",),
            ),
            Asset(
                name="corpus_state",
                fn=_corpus_state,
                deps=("corpus_clean",),
                group="corpus_lake",
                partitioning=DAILY,
                write_output=False,
            ),
            Asset(
                name="corpus_doc_buckets",
                fn=_corpus_doc_buckets,
                deps=("corpus_clean",),
                group="corpus_lake",
                partitioning=DAILY,
                partition_cols=("day",),
            ),
            Asset(
                name="corpus_dsir_state",
                fn=_corpus_dsir_state,
                deps=("corpus_doc_buckets",),
                group="corpus_lake",
                partitioning=DAILY,
                partition_cols=("day",),
            ),
            Asset(
                name="corpus_postings_hh",
                fn=_corpus_postings_hh,
                deps=("corpus_clean",),
                group="corpus_lake",
                partitioning=DAILY,
                partition_cols=("day",),
            ),
            Asset(
                name="corpus_stopterms",
                fn=_corpus_stopterms,
                deps=("corpus_postings_hh",),
                group="corpus_curate",
                partitioning=UNPARTITIONED,
            ),
            Asset(
                name="corpus_eval_shingles",
                fn=_corpus_eval_shingles,
                group="corpus_lake",
                # DAILY cadence (no partition cols — the table is a plain
                # full refresh): run_day phases DAILY assets before
                # UNPARTITIONED ones, and this state must land BEFORE the
                # day's corpus_contam reads it — an UNPARTITIONED kind
                # would run in the later phase and day 1's contamination
                # would silently see an empty eval set
                partitioning=DAILY,
            ),
            Asset(
                name="corpus_contam",
                fn=_corpus_contam,
                deps=("corpus_clean", "corpus_eval_shingles"),
                group="corpus_lake",
                partitioning=DAILY,
                partition_cols=("day",),
            ),
            Asset(
                name="corpus_lm_state",
                fn=_corpus_lm_state,
                deps=("corpus_clean",),
                group="corpus_lake",
                partitioning=DAILY,
                partition_cols=("day",),
            ),
            Asset(
                name="corpus_lm_quality",
                fn=_corpus_lm_quality,
                # the state dep is lineage only — quality reads STRICTLY
                # prior days' state, so ordering vs the day's own state
                # write is immaterial (and what makes re-runs idempotent)
                deps=("corpus_clean", "corpus_lm_state"),
                group="corpus_curate",
                partitioning=DAILY,
                partition_cols=("day",),
            ),
            Asset(
                name="corpus_gated",
                fn=_corpus_gated,
                deps=(
                    "corpus_clean",
                    "corpus_doc_buckets",
                    "corpus_dsir_state",
                    "corpus_contam",
                    "corpus_lm_quality",
                ),
                group="corpus_curate",
                partitioning=DAILY,
                partition_cols=("day",),
            ),
            Asset(
                name="corpus_packed",
                fn=_corpus_packed,
                deps=("corpus_gated",),
                group="corpus_curate",
                partitioning=DAILY,
                partition_cols=("day",),
            ),
            Asset(
                name="corpus_stats",
                fn=_corpus_stats,
                deps=("corpus_packed",),
                group="corpus_curate",
                partitioning=UNPARTITIONED,
            ),
            Asset(
                name="corpus_shards",
                fn=_corpus_shards,
                deps=("corpus_packed",),
                group="corpus_curate",
                partitioning=UNPARTITIONED,
            ),
        ]
    )
