"""Paraphrase-STORM probe for the round-12 within-batch near-dup pass
(plans/corpus_pipeline.py _corpus_clean; SCALE.md).

The within-batch pass bands the day's batch against itself. Its known
hard case is NOT a storm of identical docs (the exact pass upstream
collapses those map-side before banding ever sees them) but a storm of
k DISTINCT paraphrases of one page: they share band keys, so an
all-pairs (band, band_key) self-join fans out ~k² candidate pairs
inside the hot buckets, and the exact-Jaccard verify pays
|pairs| x shingles. This probe measures that curve honestly: a fixed
batch of unique docs plus k planted paraphrases (same base text,
per-copy unique trailer word), one day through the FULL asset graph,
for growing k.

Measured closure (SCALE.md): the naive all-pairs form hit 151 s at
k=5000 vs a 37 s baseline; the shipped two-phase existential form
(dedup.within_batch_near_dup_drops — probe each doc against its
buckets' two smallest member ids first, all-pairs only for the
unresolved remainder) holds ~26 s flat in k with an identical answer
set (property-pinned). Re-run this probe after any change to the
within-batch pass to confirm the flat-in-k shape still holds.

Usage:
    PYTHONPATH=. python tools/scale_wb_storm.py [base] [k1,k2,...]
Defaults: base=5000 unique docs, storms 100,1000,5000.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from tools.scale_corpus_day import synth


def main() -> int:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    storms = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [100, 1000, 5000]
    )

    from aave_etl_spark.io.table_store import TableStore
    from aave_etl_spark.plans.corpus_pipeline import corpus_pipeline_graph
    from aave_etl_spark.plans.orchestration import run_day
    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_wb_storm")
    spark.sparkContext.setLogLevel("ERROR")
    graph = corpus_pipeline_graph()

    # one viral page every paraphrase shares; per-copy unique trailer so
    # the EXACT pass keeps all k copies distinct and the near pass does
    # the work (J ~ 0.8+, bands collide with high probability)
    viral = (
        "the viral of page and copies is a storm the crawler of loops and"
        " mirrors is a flood the spam of farms and scrapes is a wave with"
        " more filler words here to keep the gate features in range"
    )

    for k in storms:
        root = tempfile.mkdtemp(prefix="scale_wb_storm_")
        store = TableStore(spark, root)
        uniq = synth(spark, base, 0, "2024-01-01")
        copies = spark.range(30_000_000, 30_000_000 + k).select(
            F.col("id").alias("doc_id"),
            F.lit("en").alias("lang"),
            F.concat_ws(
                " ",
                F.lit(viral),
                F.substring(F.md5(F.col("id").cast("string")), 1, 8),
            ).alias("text"),
            F.to_date(F.lit("2024-01-01")).alias("day"),
        )
        landing = uniq.unionByName(copies).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        run_day(
            spark, store, graph, "2024-01-01", markets=[],
            resources={"landing": landing},
        )
        t1 = time.perf_counter()
        n_clean = store.read("corpus_clean").count()
        # the keep-lowest contract: exactly ONE paraphrase survives
        n_storm_kept = store.read(
            "corpus_clean", where="doc_id >= 30000000"
        ).count()
        print(
            f"storm k={k}: day wall {t1 - t0:.1f}s "
            f"(clean {n_clean}, storm survivors {n_storm_kept})",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
