"""History-growth probe for the CROSS-DAY span-dedup state
(operators/dedup.py span_index_build/append + span_dedup_rewrite
prior_spans; plans/corpus_pipeline.py round 13; SCALE.md).

The daily question: as the at-rest ``corpus_spans`` state accumulates,
what does one day's span stage cost? The state join is bucketed on the
window hash (zero exchange on the stored side) and reads SKINNY keeper
rows — hash + ids, never corpus text — so the day's cost is the batch's
window work plus one bucketed scan of the state. That scan is
state-row-linear by construction (substring dedup's suffix-array cost
shape: ~one row per corpus token); this probe measures the curve
honestly across a 16x history growth and asserts the cross-day cut
contract (every batch doc lifting a history span loses exactly that
span; fresh docs pass byte-identical; the append adds only
batch-novel hashes).

Usage:
    PYTHONPATH=. python tools/scale_span_state.py [batch] [h1,h2,...]
Defaults: batch=5000 docs (1/5 lifting a history span), histories
25k,100k,400k docs (~9 window hashes each).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def _synth(spark, lo: int, n: int, tag: str):
    # ~16 unique tokens per doc from md5 nibbles — no shared windows
    return spark.range(lo, lo + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.lit(tag), F.col("id").cast("string"), F.lit(i)
                        )
                    ),
                    1,
                    10,
                )
                for i in range(16)
            ],
        ).alias("text"),
    )


def main() -> int:
    batch_n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    hists = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [25_000, 100_000, 400_000]
    )

    from aave_etl_spark.io.table_store import TableStore
    from aave_etl_spark.operators.dedup import (
        span_dedup_rewrite,
        span_index_append,
        span_index_build,
    )
    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_span_state")
    spark.sparkContext.setLogLevel("ERROR")

    boiler = (
        "this site uses cookies to improve your experience accept all to"
        " continue"
    )
    for h in hists:
        root = tempfile.mkdtemp(prefix="span_state_")
        store = TableStore(spark, root)
        hist = _synth(spark, 0, h, "hist")
        # plant the boilerplate into ONE history doc so its windows are
        # canonical at rest (day-1 keeper)
        hist = hist.withColumn(
            "text",
            F.when(
                F.col("doc_id") == 0, F.concat_ws(" ", F.lit(boiler), "text")
            ).otherwise(F.col("text")),
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        span_index_build(store, hist, "spans", n=8)
        t_build = time.perf_counter() - t0
        state_rows = store.read_bucketed("spans").count()

        # the day's batch: 4/5 fresh docs, 1/5 carrying the history span
        fresh = _synth(spark, 50_000_000, batch_n * 4 // 5, "fresh")
        lifted = _synth(spark, 60_000_000, batch_n // 5, "lift").select(
            "doc_id",
            F.concat_ws(
                " ",
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 10),
                F.lit(boiler),
                "text",
            ).alias("text"),
        )
        batch = fresh.unionByName(lifted).localCheckpoint(eager=True)

        t1 = time.perf_counter()
        rw = span_dedup_rewrite(
            batch, n=8, prior_spans=store.read_bucketed("spans")
        ).localCheckpoint(eager=True)
        stats = rw.agg(
            F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0)).alias("cut"),
            F.sum("n_removed").alias("removed"),
        ).collect()[0]
        rewritten = rw.select(
            "doc_id", F.col("text_deduped").alias("text")
        )
        span_index_append(store, rewritten, "spans", n=8)
        t_day = time.perf_counter() - t1
        after = store.read_bucketed("spans").count()

        n_lift = batch_n // 5
        assert stats.cut == n_lift, (stats, n_lift)
        print(
            f"history {h} docs (state {state_rows} hash rows, build"
            f" {t_build:.1f}s): day wall {t_day:.1f}s — {stats.cut} lifted"
            f" docs cut ({stats.removed} tokens), appended"
            f" {after - state_rows} new hashes for {batch_n} batch docs",
            flush=True,
        )
        spark.sql("DROP TABLE IF EXISTS spans")
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
