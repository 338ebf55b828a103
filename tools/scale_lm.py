"""Rolling-reference-LM probe (SCALE.md): the per-day cost of the
corpus_lm_quality scoring stage against GROWING at-rest count state
(plans/corpus_pipeline.py _corpus_lm_state / _corpus_lm_quality).

The LM suite's honest history term: the per-day STATE WRITE is
batch-bound (one tokenize+explode of the day's text), but the scoring
stage joins the day's token stream against the rolled-up state, whose
row count grows with DISTINCT grams. Real corpora saturate sublinearly
(Heaps' law); this probe uses the synth generator's WORST case —
md5-derived words, so ~37 never-repeating grams per doc and the state
grows ~linearly — and measures (a) the scoring day wall vs prior-state
size, and (b) the shipped remedy, Brants et al. 2007 §4.2's count
cutoff (the ``lm_min_tf`` resource): under an open vocabulary the
singleton grams ARE the growth, so ``tf >= 2`` collapses the rolled
table to the shared-template vocabulary.

Usage:
    PYTHONPATH=. python tools/scale_lm.py [batch] [hist1,hist2,...]
Defaults: batch=5000 docs/day, histories 1,4,16 prior days.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from tools.scale_corpus_day import synth


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    hists = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1, 4, 16]
    )

    from aave_etl_spark.operators import text as text_ops
    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_lm")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="scale_lm_")
    path = root + "/lm_state"
    rows = []
    try:
        max_h = max(hists)
        # lay down max_h days of count state, one day-partition each —
        # the _corpus_lm_state shape (day, w1, w2, tf)
        for d in range(max_h):
            day = f"2024-01-{d + 1:02d}"
            counts = text_ops.ngram_counts(
                synth(spark, batch, 1_000_000 * d, day)
            ).select(F.to_date(F.lit(day)).alias("day"), "w1", "w2", "tf")
            counts.write.mode("append").partitionBy("day").parquet(path)
        score_day = synth(spark, batch, 1_000_000 * max_h, "2024-02-01")
        score_day = score_day.localCheckpoint(eager=True)
        for h in hists:
            for min_tf in (None, 2) if h == max_h else (None,):
                state = spark.read.parquet(path).where(
                    f"day <= DATE '2024-01-{h:02d}'"
                )
                rolled = state.groupBy("w1", "w2").agg(
                    F.sum("tf").alias("tf")
                )
                if min_tf is not None:
                    rolled = rolled.filter(F.col("tf") >= min_tf)
                t0 = time.perf_counter()
                n = text_ops.stupid_backoff_score(score_day, rolled).count()
                wall = time.perf_counter() - t0
                srows = rolled.count()
                rows.append(
                    {
                        "hist_days": h,
                        "min_tf": min_tf,
                        "state_rows": srows,
                        "scored_docs": n,
                        "score_wall_s": round(wall, 1),
                    }
                )
                print(json.dumps(rows[-1]), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"batch": batch, "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
