"""Union-aligned operator family heads.

Two rounds of driver evidence show the correctness gate caps at the first 50
registry entries, so cheap singleton operator queries share a registry slot:
each family head unions its parts onto a common
``(head, k1..kN STRING, v1..vM DOUBLE)`` superset schema. The SAME portable
SQL alignment expressions run on both engines — via ``selectExpr`` over the
part's Spark DataFrame and verbatim over the part's DuckDB oracle as a
subquery — so the driver compare stays row-level exact per part (pure
renames, string casts of keys, double casts of measures, typed-NULL pads).

The singleton queries stay registered with ``export=False``: pytest's
oracle-parity gate keeps certifying each part in isolation, while the driver
certifies the union. This mirrors the datamart family-head consolidation
(queries/datamart_real.py) on the generic-operator surface.
"""

from __future__ import annotations

from functools import reduce

from aave_etl_spark.queries.registry import all_queries, register

# head name → [(tag, part query name)] — bench.py uses this to attribute
# a family head's wall-clock to its parts (cross-round head totals grow
# exactly when parts are added; the breakdown makes that visible without
# diff archaeology)
FAMILY_PARTS: dict[str, list[tuple[str, str]]] = {}


def _aligned_exprs(
    tag: str, keys: tuple[str, ...], vals: tuple[str, ...], ns: int, nv: int
) -> list[str]:
    """Portable SELECT items for one part (identical text on Spark/DuckDB)."""
    cols = [f"'{tag}' AS head"]
    for i in range(ns):
        src = f"CAST({keys[i]} AS STRING)" if i < len(keys) else "CAST(NULL AS STRING)"
        cols.append(f"{src} AS k{i + 1}")
    for j in range(nv):
        src = f"CAST({vals[j]} AS DOUBLE)" if j < len(vals) else "CAST(NULL AS DOUBLE)"
        cols.append(f"{src} AS v{j + 1}")
    return cols


def family(
    name: str, parts: list[tuple[str, str, tuple[str, ...], tuple[str, ...]]], doc: str
) -> None:
    """Register a family head over already-registered (export=False) parts.

    parts: (tag, part_query_name, key_exprs, val_exprs) — exprs are portable
    SQL over the part's OUTPUT columns. A miscounted alignment fails loudly:
    selectExpr errors on a missing column rather than silently truncating.
    """
    qs = all_queries()
    resolved = [(tag, qs[qname], keys, vals) for tag, qname, keys, vals in parts]
    for _, q, _, _ in resolved:
        if q.oracle is None:
            raise ValueError(f"family {name!r}: part {q.name!r} has no oracle")
    ns = max(len(p[2]) for p in resolved)
    nv = max(len(p[3]) for p in resolved)

    def builder(spark, sf_dir, _resolved=resolved, _ns=ns, _nv=nv):
        dfs = [
            q.builder(spark, sf_dir).selectExpr(*_aligned_exprs(tag, keys, vals, _ns, _nv))
            for tag, q, keys, vals in _resolved
        ]
        return reduce(lambda a, b: a.unionByName(b), dfs)

    oracle = "\nUNION ALL\n".join(
        "SELECT "
        + ", ".join(_aligned_exprs(tag, keys, vals, ns, nv))
        + f" FROM (\n{q.oracle}\n) AS _{tag}"
        for tag, q, keys, vals in resolved
    )
    FAMILY_PARTS[name] = [(tag, qname) for tag, qname, _, _ in parts]
    register(name, oracle=oracle, doc=doc)(builder)


# ---------------------------------------------------------------------------
# §2 text-analysis trio over documents (all keyed by doc_id).
# ---------------------------------------------------------------------------
family(
    "llm_text_stats",
    [
        ("fingerprint", "llm_fingerprint", ("doc_id", "fingerprint"), ("group_size",)),
        (
            "dedup_exact",
            "llm_dedup_exact",
            ("digest",),
            ("keeper_id", "dup_count"),
        ),
        (
            "token_stats",
            "llm_token_stats",
            ("doc_id",),
            ("n_tokens", "n_distinct_tokens", "avg_token_len", "n_bpe_tokens"),
        ),
        (
            "quality",
            "llm_quality_features",
            ("doc_id",),
            ("n_chars", "n_words", "stopword_ratio", "punct_ratio", "distinct_ratio"),
        ),
        ("ngram_topk", "llm_ngram_topk", ("ngram",), ("doc_freq", "rank")),
        ("kmv", "llm_kmv_distinct", ("lang",), ("est_distinct", "exact_distinct")),
        ("kmv_merge", "llm_kmv_merge", ("lang",), ("est_distinct",)),
        ("kmv_atrest", "llm_kmv_atrest", ("lang",), ("est_distinct",)),
        (
            "rsq",
            "llm_rowsample_quantiles",
            ("lang",),
            ("n_sample", "p50", "p90"),
        ),
        (
            "rsq_atrest",
            "llm_rsq_atrest",
            ("lang",),
            ("n_sample", "p50", "p90"),
        ),
        (
            "hh",
            "llm_topk_merge",
            ("lang", "value"),
            ("count_lb", "count_ub", "CAST(exact AS DOUBLE)", "rank"),
        ),
        (
            "hh_atrest",
            "llm_hh_atrest",
            ("lang", "value"),
            ("count_lb", "count_ub", "CAST(exact AS DOUBLE)", "rank"),
        ),
        (
            "line_dedup",
            "llm_line_dedup",
            ("doc_id", "clean_md5"),
            ("n_lines", "n_kept"),
        ),
        (
            "repetition",
            "llm_repetition",
            ("doc_id",),
            ("n_bigrams", "n_distinct_bigrams", "repetition_ratio"),
        ),
        (
            "chunks",
            "llm_doc_chunks",
            ("doc_id", "chunk_id", "chunk_md5"),
            ("n_chunk_tokens",),
        ),
        (
            "scrub",
            "llm_scrub_pii",
            ("doc_id", "clean_md5"),
            ("n_urls", "n_emails", "n_long_nums"),
        ),
        (
            "gate",
            "llm_curation_gate",
            ("doc_id",),
            ("q_ok", "rep_ok", "lang_ok", "dup_ok", "kept"),
        ),
        (
            "length_pct",
            "llm_length_percentiles",
            ("lang",),
            ("p50", "p90", "p99", "n_docs"),
        ),
        (
            "topfrac",
            "llm_quality_topfrac",
            ("doc_id", "lang"),
            ("score", "q_rank", "n_group", "CAST(kept AS DOUBLE)"),
        ),
        (
            "c4_lines",
            "llm_c4_line_filter",
            ("doc_id", "clean_md5"),
            ("n_lines", "n_kept_lines", "clean_chars", "CAST(doc_kept AS DOUBLE)"),
        ),
        (
            "pipeline",
            "llm_curation_pipeline",
            ("part", "k1", "k2"),
            ("v1", "v2", "v3"),
        ),
        (
            "tempmix",
            "llm_curation_tempmix",
            ("part", "k1"),
            ("v1", "v2", "v3"),
        ),
        (
            "wdraw",
            "llm_curation_wdraw",
            ("part", "k1", "k2"),
            ("v1", "v2", "v3"),
        ),
        (
            "gopher",
            "llm_gopher_quality",
            ("doc_id",),
            ("n_words", "mean_word_len", "symbol_word_ratio",
             "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
             "n_stop_hits", "dup_line_frac", "dup_line_char_frac",
             "CAST(gopher_kept AS DOUBLE)"),
        ),
    ],
    doc=(
        "text-analysis family: rolling-hash fingerprint + token stats +"
        " quality features + corpus top-k bigram document frequencies +"
        " KMV distinct-text sketch per language + MERGEABLE per-(lang,"
        " source) KMV sketches rolled up by union (merge == direct,"
        " exactly; in-flight AND at-rest through the TableStore) +"
        " MERGEABLE row-sample quantile sketches (bottom-k"
        " uniform samples pooled by re-taking the bottom-k, percentiles"
        " from the pooled sample; in-flight AND at-rest) +"
        " MERGEABLE heavy hitters (deterministic"
        " per-part exact top-m with rest_max undercount bounds, pooled"
        " top-k with honest [lb, ub]) + GLOBAL line-level dedup with"
        " document reconstruction"
        " (RefinedWeb boilerplate removal, planted cross-doc newsletter"
        " lines) + Gopher-style repetition"
        " signal + sliding-window context chunking + PII/URL scrubbing"
        " (the BM25 retrieval quartet moved to corpus_state_family in"
        " round 12's head rebalance; the LM/tokenizer quartet — unigram"
        " NLL, stupid backoff, vocab coverage, BPE — to llm_lm_family in"
        " round 13's) + exact content-digest dedup (hash-groupBy keeper +"
        " dup count, folded from its round-1 singleton slot)"
        " + the composed per-doc curation gate"
        " (quality x repetition x language x exact-dup keeper) +"
        " per-language quality-percentile top-50% gate + C4-style"
        " line-level cleaning with the kept-lines doc gate + the"
        " END-TO-END curation pipeline (C4 clean -> exact dedup ->"
        " near-dup keeper -> quality/lang gate -> DSIR -> domain mix ->"
        " sequence pack) certified as one flow + the PLANNED-mix pipeline"
        " (temperature mixture rates planned from the gated corpus feeding"
        " the domain mixer) + the QUALITY-WEIGHTED budget draw (A-ES"
        " sample of the mixed corpus by the gate stage's quality score,"
        " packed) — all three tails certified off ONE shared stage-1..5"
        " chain (chain-once/certify-many) + the Gopher quality rules"
        " (symbol/bullet/ellipsis ratios, alpha-word + stop-word floors,"
        " duplicate-line pair) with every arm exercised via planted"
        " line-level defects"
    ),
)

# ---------------------------------------------------------------------------
# Language-model / tokenizer family: the corpus-statistics rungs that model
# the token stream itself. Split from llm_text_stats in round 13 (its parts
# sum had grown past the per-head watch line); the freed driver slot is
# paid for by folding the exact-dedup singleton into llm_text_stats.
# ---------------------------------------------------------------------------
family(
    "llm_lm_family",
    [
        (
            "logprob",
            "llm_unigram_logprob",
            ("doc_id",),
            ("n_tokens", "avg_neg_logprob"),
        ),
        (
            "sbo",
            "llm_stupid_backoff",
            ("doc_id",),
            ("n_tokens", "avg_neg_logprob"),
        ),
        (
            "vocab",
            "llm_vocab_coverage",
            ("lang",),
            ("n_tokens", "vocab_size", "k_cov", "top1_share"),
        ),
        (
            "bpe",
            "llm_bpe_vocab",
            ("part", "k1", "k2", "k3", "k4"),
            ("v1", "v2"),
        ),
    ],
    doc=(
        "language-model/tokenizer family: the unigram-NLL perplexity"
        " proxy (self-scored corpus frequencies) + stupid-backoff bigram"
        " LM scoring against a separately-trained reference LM (Brants"
        " et al. 2007 — seen-bigram ratio, alpha backoff, alpha/N OOV"
        " floor) + the vocabulary coverage curve (k_cov tokenizer-sizing"
        " statistic) + BPE vocabulary INDUCTION (Sennrich et al. 2016 —"
        " 4 learned merges certified with their weighted pair counts,"
        " plus the full vocabulary segmented under the learned table)"
    ),
)

# ---------------------------------------------------------------------------
# §2.7 UNION ALL w/ lit-0 padding + UNION DISTINCT.
# ---------------------------------------------------------------------------
family(
    "union_family",
    [
        (
            "all_padded",
            "union_all_padded",
            ("CAST(day AS DATE)", "measure"),
            ("value", "fee"),
        ),
        ("distinct_keys", "union_distinct_keys", ("nationkey",), ()),
        ("range_tiers", "quantity_tier_range_join", ("tier",), ("n_rows", "sum_qty")),
        ("strat_sample", "llm_stratified_sample", ("lang", "doc_id"), ("sample_rank",)),
        ("split", "llm_train_test_split", ("lang", "split"), ("n_docs",)),
        (
            "decontam",
            "llm_decontaminate",
            ("doc_id",),
            ("n_shingles", "n_overlap", "contamination_ratio"),
        ),
        ("mix", "llm_data_mix", ("lang",), ("keep_frac", "n_docs", "n_kept")),
        (
            "wsample",
            "llm_weighted_sample",
            ("lang", "doc_id"),
            ("sample_key", "sample_rank"),
        ),
        (
            "span",
            "llm_span_dedup",
            ("doc_id",),
            ("n_windows", "n_dup_windows", "dup_fraction"),
        ),
        (
            "span_rw",
            "llm_span_rewrite",
            ("doc_id", "text_deduped"),
            ("n_tokens", "n_removed"),
        ),
        (
            "atoken_measures",
            "warehouse_atoken_measures",
            ("market", "chain", "collector", "token", "symbol",
             "CAST(block_day AS DATE)"),
            ("CAST(block_height AS DOUBLE)", "balance", "scaled_balance",
             "accrued_fees", "tokens_in_external", "tokens_in_internal",
             "tokens_out_external", "tokens_out_internal",
             "minted_to_treasury_amount", "minted_amount"),
        ),
        (
            "dsir",
            "llm_dsir_resample",
            ("doc_id",),
            ("n_grams", "weight", "sample_key", "CAST(kept AS DOUBLE)"),
        ),
        (
            "mix_plan",
            "llm_mix_plan",
            ("lang",),
            ("n_units", "mix_share", "sample_rate", "expected_units"),
        ),
        (
            "non_atoken_measures",
            "warehouse_non_atoken_measures",
            ("market", "chain", "contract_address", "token", "symbol",
             "CAST(block_day AS DATE)"),
            ("balance", "tokens_in_external", "tokens_in_internal",
             "tokens_out_external", "tokens_out_internal",
             "paraswap_fees_claimable"),
        ),
        (
            "ppx_buckets",
            "llm_perplexity_buckets",
            ("doc_id", "lang", "bucket"),
            ("avg_neg_logprob",),
        ),
    ],
    doc=(
        "§2.7 union family: UNION ALL with lit-0 padding + UNION DISTINCT +"
        " bucketized range join (plain-BETWEEN oracle identity) + the"
        " deterministic hash-sampling partition of the corpus (stratified"
        " exact-k sample + train/test split) + WEIGHTED sampling without"
        " replacement (Efraimidis-Spirakis exponential-clock keys,"
        " weight-proportional, deterministic) + DSIR importance resampling"
        " (hashed-ngram log-likelihood-ratio weights, Gumbel-top-k) +"
        " temperature-scaled mixture planning (mC4 share ∝ mass^0.7,"
        " budget-capped sampling rates) + the REAL warehouse"
        " atoken/non-atoken measure-join transforms (classify/quadrant/"
        " paraswap-stack, data_warehouse.py:84-335) + the cross-split"
        " decontamination gate built on that split + substring-level"
        " duplicated-span fractions (window-hash span dedup) + the span"
        " REMOVAL rewrite (Lee et al. 'except one': non-canonical"
        " duplicated windows cut, docs rebuilt from surviving token"
        " positions) + CCNet-style"
        " per-language head/middle/tail perplexity buckets"
    ),
)

# ---------------------------------------------------------------------------
# §2.5 window-shift trio: LEAD pairing, LAG ratio, last_value ignore-nulls
# ffill (ffill keyed by unique event_id; its full-resolution NTZ ts column is
# dropped from the alignment — timestamp stringification is not
# engine-portable, and event_id already pins the row).
# ---------------------------------------------------------------------------
family(
    "window_shift_family",
    [
        (
            "lead",
            "lead_day_pairing",
            ("user_id", "CAST(day AS DATE)"),
            ("start_balance", "end_balance", "day_change"),
        ),
        (
            "lag",
            "lag_daily_ratio",
            ("user_id", "CAST(day AS DATE)"),
            ("day_value", "day_over_day"),
        ),
        ("ffill", "forward_fill_ignore_nulls", ("event_id", "user_id"), ("value_ffill",)),
        (
            "asof",
            "asof_last_purchase",
            ("event_id", "event_type"),
            ("value", "asof_purchase_value", "asof_purchase_event_id"),
        ),
        (
            "market_state_config",
            "warehouse_market_state_config",
            ("part", "k1", "k2"),
            ("v1",),
        ),
        (
            "stream_sessions",
            "stream_sessionize_store",
            ("user_id", "session_start_us"),
            ("n_events", "session_value"),
        ),
        (
            "stream_dedup",
            "stream_dedup_store",
            ("event_id", "event_type"),
            ("user_id", "value"),
        ),
        (
            "stream_rollup",
            "stream_rollup_store",
            ("event_type", "window_start_us"),
            ("n_events", "total_value"),
        ),
        (
            "scd2",
            "scd2_orders_dim",
            (
                "o_custkey",
                "o_orderstatus",
                "o_orderpriority",
                "effective_from",
                "effective_to",
            ),
            ("CAST(is_current AS DOUBLE)", "version"),
        ),
        (
            "stream_emb",
            "llm_emb_stream_ingest",
            ("CAST(vec_id AS STRING)",),
            ("cell_id",),
        ),
        (
            "scan_quintet",
            "connector_scan_quintet",
            ("part", "k1", "k2"),
            ("v1", "v2", "v3", "v4"),
        ),
    ],
    doc=(
        "§2.5 window-shift family: LEAD pairing + LAG coalesce + ffill ignore"
        " nulls + as-of temporal join (sort-merge union+window form) + the"
        " REAL warehouse market state/config transforms (UI compounding"
        " APYs, eMode left-join NULL arms) + STATEFUL STREAMING certified at"
        " rest (session_window + watermark drained append-mode to parquet,"
        " sentinel-closed, equal to the batch gap-session oracle) +"
        " STREAMING at-least-once dedup at rest (jitter-replayed events"
        " dropped by dropDuplicatesWithinWatermark, table equals the"
        " originals) + the STREAMING tumbling-window rollup at rest"
        " (epoch-aligned F.window == date_trunc, sentinel-closed) + the SCD"
        " Type-2 dimension build (versioned rows, half-open validity"
        " intervals, NULL-safe no-op collapse) + STREAMING ANN-index"
        " maintenance at rest (foreachBatch vector ingest: batch 1 builds"
        " the frozen-quantizer IVF index, batch 2's exact/rescaled/"
        " within-batch replicas drop via the semantic anti-join — the"
        " at-least-once replay idempotence mechanism — and the final index"
        " equals the daily pipeline's assignment oracle)"
        " + the connector scan quintet (S7 decimal adjust, S16 Compound"
        " APY, S18 zero-balance drop, S19 existence->NULL,"
        " treasury-incentives v3/v2 dispatch) moved from json_family in"
        " round 12's head rebalance"
    ),
)

# ---------------------------------------------------------------------------
# Time-rollup pair: §2.9 date_trunc day rollup + the hypertable-style
# day+month GROUPING SETS continuous aggregate.
# ---------------------------------------------------------------------------
family(
    "time_rollup_family",
    [
        (
            "day_rollup",
            "date_rollup",
            ("CAST(day AS DATE)", "CAST(next_day AS DATE)"),
            ("n_events", "total_value"),
        ),
        (
            "hypertable",
            "hypertable_rollup",
            ("grain", "bucket"),
            ("n_events", "total_value"),
        ),
        (
            "pipeline",
            "orchestration_backfill_run",
            ("day",),
            ("n_events", "n_users", "total_value", "day_over_day"),
        ),
        (
            "wh_trio",
            "warehouse_transforms_trio",
            ("part", "k1", "k2", "k3"),
            ("v1", "v2"),
        ),
        (
            "depth_append",
            "liquidity_depth_append_store",
            ("from_asset", "to_asset"),
            ("from_asset_price", "from_amount_native", "from_amount_usd",
             "to_asset_price", "to_amount_native", "to_amount_usd",
             "price_impact"),
        ),
        (
            "stream_ingest",
            "llm_stream_ingest",
            ("CAST(doc_id AS STRING)", "digest"),
            (),
        ),
        (
            "clustered",
            "clustered_scan_store",
            ("l_returnflag",),
            ("sum_qty", "sum_price", "n_rows"),
        ),
        (
            "zorder",
            "zorder_scan_store",
            ("l_returnflag",),
            ("sum_qty", "n_rows"),
        ),
    ],
    doc=(
        "time-rollup family: §2.9 date_trunc+interval day rollup + the"
        " hypertable-style multi-granularity GROUPING SETS aggregate + the"
        " orchestration backfill pipeline (lake→warehouse→datamart through"
        " TableStore dynamic partition overwrite, read back from the store)"
        " + the K2 append-only liquidity-depth snapshot table with the"
        " fetch_time-latest model read from the appended store + the"
        " warehouse trio (token-price min-rank pick, per-chain block"
        " dedup, last-match-wins balance-group classification) + the"
        " availableNow streaming corpus ingest certified at rest (two"
        " checkpointed drains, foreachBatch content dedup, replicas"
        " anti-joined away) + the sort-clustered lineitem store"
        " (cluster_by row concentration asserted from input_file_name —"
        " the layout property row-group pruning exploits) + the Z-ORDER"
        " (Morton-interleaved) twin where BOTH clustered dimensions'"
        " predicates concentrate independently"
        " (the at-rest IVF/IVF-PQ/BM25 index searches and the corpus"
        " pipeline's state certs moved to corpus_state_family in round 12"
        " — this head had crossed the 15 s split threshold)"
    ),
)

# ---------------------------------------------------------------------------
# The corpus/ANN AT-REST STATE family: the daily corpus pipeline's e2e run
# and its incremental state certs + the at-rest index searches they compose
# with. Split out of time_rollup_family in round 12 (it crossed the ~15 s
# per-head watch threshold); the corpus-state parts share one orchestrated
# scratch store built once per session (_corpus_run_store).
# ---------------------------------------------------------------------------
family(
    "corpus_state_family",
    [
        (
            "corpus_run",
            "llm_corpus_pipeline_run",
            ("part", "k1", "k2", "k3"),
            ("v1", "v2", "v3"),
        ),
        (
            "corpus_dsir",
            "llm_corpus_dsir_state",
            ("doc_id",),
            ("n_grams", "weight"),
        ),
        (
            "corpus_resample",
            "llm_corpus_dsir_resample",
            ("doc_id",),
            ("n_grams", "weight", "sample_key", "CAST(kept AS DOUBLE)"),
        ),
        (
            "corpus_decontam",
            "llm_corpus_decontam",
            ("day", "CAST(doc_id AS STRING)"),
            ("n_shingles", "n_overlap", "contamination_ratio",
             "CAST(flagged AS DOUBLE)"),
        ),
        (
            "span_state",
            "llm_corpus_span_state",
            ("part", "k1", "k2", "k3"),
            ("v1",),
        ),
        (
            "lm_state",
            "llm_corpus_lm",
            ("part", "k1", "k2", "k3"),
            ("v1", "v2"),
        ),
        (
            "lm_keep",
            "llm_corpus_lm_keep",
            ("CAST(doc_id AS STRING)", "bucket"),
            ("CAST(kept AS DOUBLE)",),
        ),
        (
            "corpus_stopterms",
            "llm_corpus_stopterms",
            ("value",),
            ("count_lb", "count_ub", "CAST(exact AS DOUBLE)", "rank"),
        ),
        (
            "ivf_at_rest",
            "llm_ivf_index_search",
            ("query_id", "candidate_id"),
            ("cos_sim", "rank"),
        ),
        (
            "ivfpq_at_rest",
            "llm_ivfpq_index_search",
            ("CAST(query_id AS STRING)", "CAST(candidate_id AS STRING)"),
            ("cell_id", "approx_d2", "rank"),
        ),
        (
            "bm25_index",
            "llm_bm25_index_search",
            ("query_id", "candidate_id"),
            ("bm25_score", "rank"),
        ),
        ("bm25", "llm_bm25_topk", ("doc_id", "term"), ("tf", "bm25", "rank")),
        (
            "bm25_capped",
            "llm_bm25_capped",
            ("query_id", "candidate_id"),
            ("bm25_score", "rank"),
        ),
        (
            "bm25_stopterms",
            "llm_bm25_stopterms",
            ("part", "k1", "k2"),
            ("v1", "v2", "v3"),
        ),
        (
            "stopterms_atrest",
            "llm_bm25_stopterms_atrest",
            ("part", "k1", "k2"),
            ("v1", "v2", "v3"),
        ),
    ],
    doc=(
        "corpus/ANN at-rest state family: the DAILY training-corpus"
        " pipeline run END-TO-END through the orchestration layer (planted"
        " cross-day exact replicas + near-dup variants + same-day"
        " paraphrase pairs, landing -> within-batch exact + near dedup ->"
        " cross-corpus dedup -> decontamination -> gate -> pack -> stats,"
        " every table read back from the store) + its INCREMENTAL DSIR"
        " distribution state (day 2 weighted against rolled-up per-day"
        " bucket-count states == a from-scratch corpus rescan) + the"
        " round-12 gate RESAMPLE (Gumbel-top-k keep from stored state =="
        " from-scratch DSIR resample) + the benchmark-decontamination gate"
        " (eval-set shingle digests as skinny store state, batch"
        " semi-joined against the broadcast digests, flagged docs barred)"
        " + the stop-term state (per-day df HH sketches rolled up at rest"
        " to the data-planned stop list) + the at-rest IVF index search"
        " (partition-pruned probe scan) + the at-rest IVF-PQ search (codes"
        " partitioned by cell_id, M ints per candidate, bitwise equal to"
        " the in-flight form) + the at-rest term-bucketed BM25 inverted"
        " index search (build-once/search-many, no corpus text re-scan)"
        " + the BM25 retrieval quartet moved from llm_text_stats in round"
        " 12's head rebalance (top-k term scoring, df-capped probe,"
        " data-planned stop terms in-flight AND from stored HH states)"
    ),
)

# ---------------------------------------------------------------------------
# §2.9 JSON pair: path-extract agg + schema-full from_json parse.
# ---------------------------------------------------------------------------
family(
    "json_family",
    [
        ("extract_agg", "json_extract_agg", ("k_bucket",), ("n_events", "total_value")),
        (
            "struct_parse",
            "json_struct_parse",
            ("event_type",),
            ("n_rows", "k_total", "n_missing_present"),
        ),
        (
            "abi_decode",
            "connector_minted_decode",
            ("market", "reserve", "symbol", "atoken", "atoken_symbol",
             "CAST(block_day AS DATE)"),
            ("CAST(block_height AS DOUBLE)", "minted_to_treasury_amount",
             "minted_amount"),
        ),
        (
            "scan_decet",
            "connector_scan_decet",
            ("part", "k1", "k2"),
            ("v1", "v2", "v3", "v4"),
        ),
        (
            "scan_hourly",
            "connector_scan_hourly",
            ("part", "k1", "k2"),
            ("v1", "v2", "v3", "v4"),
        ),
    ],
    doc=(
        "§2.9/§1.3 parse family: get_json_object agg + from_json struct"
        " parse + the MintedToTreasury ABI-decode connector chain (uint256"
        " limb decode, topic address, token join, tx-hash semi-join,"
        " group-to-day rollup) and the scan decet (ETH->WETH"
        " patch, transfer group-to-day, accrued-fees product, ms-epoch,"
        " wei/raw/config-decimal shifts, LSD fillna, SM emission math,"
        " pool weights) and the hourly/seed/price scan (S4 usd/wei"
        " multipliers + ethereum_v1 WETH overwrite, S13 CSV quote=''"
        " parity, S21 hourly closest-block, S22 hourly Compound v2/v3,"
        " S9h hourly reserve-data twin) vs integer-derived oracles"
    ),
)

# ---------------------------------------------------------------------------
# §2.9 financial-math pair: APY compounding + vesting clamp.
# ---------------------------------------------------------------------------
family(
    "finmath_family",
    [
        ("apy", "apy_compounding", ("l_returnflag",), ("avg_apy", "avg_apy_rounded")),
        ("vesting", "vesting_clamp", ("event_type",), ("vested_total", "deposit_total")),
        (
            "rp",
            "llm_rp_project",
            ("vec_id",),
            ("orig_norm", "proj_norm", "norm_ratio"),
        ),
        (
            "reserve_units",
            "connector_reserve_units",
            ("reserve", "field"),
            ("value",),
        ),
        (
            "scan_quartet",
            "connector_scan_quartet",
            ("part", "k1", "k2"),
            ("v1", "v2", "v3"),
        ),
        (
            "incentives_apr",
            "warehouse_incentives_apr",
            ("reserve", "symbol", "reward_token_address"),
            ("supply_rewards_apr", "variable_borrow_rewards_apr",
             "stable_borrow_rewards_apr", "supply_rewards",
             "variable_debt_rewards", "stable_debt_rewards",
             "supply_rewards_usd", "variable_debt_rewards_usd",
             "stable_debt_rewards_usd"),
        ),
    ],
    doc=(
        "§2.9 financial math family: APY compounding + stream-vesting clamp"
        " + Johnson-Lindenstrauss ±1/sqrt(r) random projection with"
        " norm-preservation gate + the S9 reserve-data parser's full"
        " unit-shift matrix (bps/ray/decimals, v2->v3 fill) certified"
        " per field + the scan quartet (S1 end-block invariant, S3"
        " positional zip, S11 eMode prefilter, S15 beacon) + the REAL"
        " warehouse LM-incentives 9-measure APR transform"
    ),
)

# ---------------------------------------------------------------------------
# §2.3 semi/anti join pair.
# ---------------------------------------------------------------------------
family(
    "semi_anti_family",
    [
        ("semi", "order_priority_semi", ("o_orderpriority",), ("order_count",)),
        (
            "anti",
            "customers_without_orders",
            ("c_mktsegment",),
            ("n_customers", "total_acctbal"),
        ),
        ("salted", "salted_hot_join", ("label",), ("sum_qty", "n_rows")),
        ("hamming", "llm_simhash_near_dup", ("id_a", "id_b"), ("hamming",)),
        (
            "ann_recall",
            "llm_ann_recall",
            ("query_id",),
            ("n_hits", "recall_at_3"),
        ),
        (
            "margin",
            "llm_margin_topk",
            ("query_id", "candidate_id"),
            ("cos_sim", "margin", "rank"),
        ),
        (
            "mh_index",
            "llm_minhash_index_match",
            ("new_id", "corpus_id"),
            (),
        ),
        (
            "pq",
            "llm_pq_topk",
            ("query_id", "candidate_id"),
            ("approx_d2", "rank"),
        ),
        (
            "rrf",
            "llm_hybrid_rrf",
            ("query_id", "candidate_id"),
            ("rrf_score", "rank"),
        ),
        (
            "rrf_atrest",
            "llm_hybrid_rrf_atrest",
            ("query_id", "candidate_id"),
            ("rrf_score", "rank"),
        ),
        (
            "corpus_retrieval",
            "llm_corpus_retrieval",
            ("query_id", "candidate_id"),
            ("bm25_score", "rank"),
        ),
    ],
    doc=(
        "§2.3 join-technique family: EXISTS semi-join + left-anti join +"
        " skew-salted hot-key join (result identical to the plain join) +"
        " banded SimHash hamming-radius join (pigeonhole-exact recall,"
        " popcount verify) + the ANN recall@3 gate (IVF index results"
        " intersection-joined against brute-force ground truth) + the"
        " margin-based (CCMatrix) candidate re-ranker + the new-batch"
        " candidate match against the AT-REST band_key-bucketed MinHash"
        " index (build-once/match-many, corpus side exchange-free) +"
        " product-quantization top-k with asymmetric distance (M-code"
        " compressed scan) + hybrid dense+sparse retrieval fused by"
        " reciprocal rank (BM25 postings probe x cosine top-k, RRF k0=60)"
        " + SELF-PLANNING retrieval over the daily corpus pipeline's"
        " store (postings from corpus_docs, the maintained corpus_stopterms"
        " asset anti-joined into the probe — no hand-picked stop config)"
    ),
)

# ---------------------------------------------------------------------------
# §2.8 reshape pair: 37-col-style UNPIVOT + multi-agg PIVOT.
# ---------------------------------------------------------------------------
family(
    "pivot_family",
    [
        ("unpivot", "unpivot_measures", ("l_returnflag", "measure"), ("value",)),
        (
            "pivot",
            "pivot_status_by_priority",
            ("o_orderpriority",),
            ("f_total", "o_total", "p_total"),
        ),
        (
            "pack",
            "llm_sequence_pack",
            ("lang", "doc_id"),
            ("n_tokens", "pack_id", "pack_offset"),
        ),
        (
            "span_pack",
            "llm_span_pack",
            ("lang", "doc_id"),
            ("n_tokens", "pack_id", "pack_offset"),
        ),
        (
            "shards",
            "llm_epoch_shards",
            ("doc_id", "sort_key"),
            ("shard", "position"),
        ),
        (
            "frames",
            "llm_frame_sample",
            ("media_id", "frame_digest"),
            ("sample_pos", "frame_idx", "ts_s"),
        ),
        (
            "incentives_flatten",
            "connector_incentives_flatten",
            ("underlying_asset", "token_type", "reward_token_address"),
            ("emission_per_second", "token_incentives_index",
             "reward_price_feed", "emission_end_timestamp",
             "incentives_last_update_timestamp"),
        ),
        (
            "cdc",
            "cdc_merge_store",
            ("o_orderkey", "o_orderstatus"),
            ("o_custkey", "o_totalprice"),
        ),
        (
            "emb_run",
            "llm_emb_pipeline_run",
            ("part", "k1", "k2"),
            ("v1",),
        ),
        (
            "emb_index",
            "llm_emb_index_state",
            ("day", "vec_id"),
            ("cell_id",),
        ),
        (
            "emb_search",
            "llm_emb_search_atrest",
            ("query_id", "candidate_id"),
            ("cos_sim", "rank"),
        ),
        (
            "emb_pq",
            "llm_emb_pq_state",
            ("day", "CAST(vec_id AS STRING)", "CAST(m AS STRING)"),
            ("cell_id", "code"),
        ),
        (
            "corpus_shards",
            "llm_corpus_shards",
            ("CAST(doc_id AS STRING)", "day", "lang", "sort_key"),
            ("shard", "position", "n_tokens", "pack_id"),
        ),
        (
            "dedup_recall",
            "llm_emb_dedup_recall",
            ("CAST(query_id AS STRING)", "CAST(truth_id AS STRING)",
             "CAST(probe_id AS STRING)"),
            ("truth_cos", "probe_cos", "found"),
        ),
        (
            "emb_health",
            "llm_emb_index_health",
            (),
            ("n_vectors", "n_cells", "mean_cell_size", "balance_point",
             "factor", "CAST(outgrown AS DOUBLE)", "recommended_n_cells"),
        ),
        (
            "emb_pq_search",
            "llm_emb_pq_search_atrest",
            ("CAST(query_id AS STRING)", "CAST(candidate_id AS STRING)"),
            ("cell_id", "approx_d2", "rank"),
        ),
        (
            "binary",
            "llm_binary_payload",
            ("CAST(doc_id AS STRING)", "content_md5"),
            ("byte_len",),
        ),
    ],
    doc=(
        "§2.8 reshape family: UNPIVOT stack + PIVOT multi-agg + greedy"
        " first-fit sequence packing (grouped-map running-sum-with-reset;"
        " recursive-CTE oracle) + the span-dedup-rewrite -> recount ->"
        " pack composition (duplicated-window removal feeding the packing"
        " recurrence as one certified flow)"
        " + fixed-budget uniform video frame sampling"
        " (metadata-only explode grid) + the S10 incentives 3-level nested"
        " flatten certified against a generate-series oracle + the"
        " deterministic epoch-shuffle shard assignment (seed-keyed md5"
        " order, per-shard windows, no global sort) + CDC MERGE INTO"
        " certified at rest (partition-pruned anti-join + dynamic partition"
        " overwrite, closed-form final-state oracle) + the daily EMBEDDINGS"
        " pipeline trio (plans/embeddings_pipeline.py: e2e run with planted"
        " exact/rescaled/within-batch replicas, the incrementally-appended"
        " at-rest IVF index certified per-vector equal to a from-scratch"
        " build under the same frozen centroids, and search over the"
        " accumulated index) + the incremental IVF-PQ code store (day 2"
        " ivfpq_index_append'ed under the frozen cells+codebook, certified"
        " per-(vector, subspace) code-level against a from-scratch encode)"
        " + the corpus pipeline's training-shard MANIFEST asset (seed-keyed"
        " epoch shuffle over the packed corpus with loader metadata,"
        " certified against the full landing-to-shards chained oracle)"
        " + the quantizer-HEALTH asset (the IVF drift trigger as stored"
        " state: outgrown flag + sqrt(N) recommendation refreshed per run,"
        " closed-form oracle)"
    ),
)

# ---------------------------------------------------------------------------
# Embedding-quantization family: the int8 round-trip quantizer and the
# PQ-prefiltered semantic-dedup probe. Split from pivot_family in round 13:
# the prefilter part alone runs ~12 s at sf0.1 (it recomputes the day-2
# probe input and the full ADC-shortlist -> exact-verify composition) and
# pushed pivot_family past the 15 s per-head watch line.
# ---------------------------------------------------------------------------
family(
    "emb_quantize_family",
    [
        (
            "quantize",
            "llm_embed_quantize",
            ("CAST(vec_id AS STRING)",),
            ("qscale", "max_abs_err", "mean_abs_err"),
        ),
        (
            "pq_prefilter",
            "llm_emb_pq_prefilter_dedup",
            ("CAST(vec_id AS STRING)",),
            (),
        ),
    ],
    doc=(
        "embedding quantization family: symmetric int8 quantization with"
        " per-vector dequantization scale (round-trip reconstruction"
        " error gated per vector) + the PQ-PREFILTERED semantic-dedup"
        " probe (round 13): the day-2 batch shortlisted by ADC over the"
        " maintained unit-vector PQ code store, exact-verified against"
        " raw vectors fetched only from shortlist candidates' day slices"
        " — certified drop-set-EQUAL to the flat raw-vector probe"
    ),
)

# ---------------------------------------------------------------------------
# §2.8/§2.4 collect pair: inline array-of-struct buckets + ordered
# collect_list fingerprint.
# ---------------------------------------------------------------------------
family(
    "collect_family",
    [
        (
            "buckets",
            "holder_distro_buckets",
            ("c_mktsegment", "bucket"),
            ("sort_order", "n_customers", "customer_share"),
        ),
        (
            "ordered_collect",
            "ordered_collect_fingerprint",
            ("user_id", "events_md5"),
            ("n_events",),
        ),
        ("lsh_verified", "llm_lsh_verified_dups", ("id_a", "id_b"), ("jaccard",)),
        (
            "cc",
            "llm_dedup_cluster",
            ("doc_id", "component"),
            ("cluster_size", "is_keeper"),
        ),
        ("pool", "llm_mean_pool", ("shard",), ("n_vecs", "mean_norm", "mean_c0")),
        (
            "semdedup",
            "llm_semantic_dedup",
            ("vec_id", "cell_id"),
            ("n_cell", "CAST(kept AS DOUBLE)"),
        ),
        (
            "ivfpq",
            "llm_ivfpq_topk",
            ("query_id", "candidate_id"),
            ("cell_id", "approx_d2", "rank"),
        ),
        (
            "knn",
            "llm_knn_classify",
            ("query_id", "pred_label"),
            ("n_votes",),
        ),
    ],
    doc=(
        "§2.8 inline array-of-struct buckets + §2.4 ordered collect-to-list"
        " md5 + the LSH candidates→exact-Jaccard verified dedup pipeline +"
        " its final connected-components cluster/keeper stage +"
        " deterministic sorted-fold embedding mean-pooling + SemDeDup"
        " semantic near-dup pruning over broadcast-argmax clusters +"
        " IVF-PQ composed ANN (probe pruning × residual-PQ asymmetric"
        " distance) + k-NN majority-vote label propagation (cosine top-5"
        " vote, ties to smallest label)"
    ),
)
