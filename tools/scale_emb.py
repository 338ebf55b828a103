"""Day-vs-history probe for the daily embeddings pipeline (SCALE.md).

Ingests a FIXED-size day-2 batch of unique synthetic vectors against
1x/10x/100x accumulated day-1 history and times both days. Unlike the
corpus pipeline (whose history terms are all skinny state), the IVF
dedup probe's cost is ~|batch| x |history| x n_probe / n_cells pair
cosines — with a FROZEN quantizer the per-day cost grows with history,
and the designed remedy is the maintenance retrain with sqrt(N)-scaled
cells. This probe measures the growth AND the remedy: after the 100x
history run, retrain with 10x the cells and ingest one more fixed
batch.

Usage:
    PYTHONPATH=. python tools/scale_emb.py [dim] [batch] [hist1,hist2,...]
Defaults: dim=32, batch=1000, histories 1000,10000,100000.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def synth(spark, n: int, dim: int, id_base: int, day: str):
    """n deterministic pseudo-random unit-cube vectors, ids id_base..+n."""
    ids = spark.range(id_base, id_base + n).select(F.col("id").alias("vec_id"))
    elem = lambda i: (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("vec_id").cast("string"), i.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967295.0)
        - 0.5
    )
    return ids.select(
        "vec_id",
        F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), elem).alias("embedding"),
        F.to_date(F.lit(day)).alias("day"),
    )


def main() -> int:
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    hists = (
        [int(x) for x in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else [1000, 10000, 100000]
    )

    from aave_etl_spark.io.table_store import TableStore
    from aave_etl_spark.plans.embeddings_pipeline import (
        EMB_N_CELLS,
        embeddings_maintenance,
        embeddings_pipeline_graph,
    )
    from aave_etl_spark.plans.orchestration import run_day
    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_emb")
    spark.sparkContext.setLogLevel("ERROR")
    graph = embeddings_pipeline_graph()

    for hist in hists:
        root = tempfile.mkdtemp(prefix="scale_emb_")
        store = TableStore(spark, root)
        d1 = synth(spark, hist, dim, 0, "2024-01-01")
        d2 = synth(spark, batch, dim, 10_000_000, "2024-01-02")
        landing = d1.unionByName(d2).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        run_day(spark, store, graph, "2024-01-01", markets=[], resources={"vectors": landing})
        t1 = time.perf_counter()
        run_day(spark, store, graph, "2024-01-02", markets=[], resources={"vectors": landing})
        t2 = time.perf_counter()
        n_idx = store.read("emb_ivf").count()
        print(
            f"hist={hist}: day1 build {t1 - t0:.1f}s, day2 fixed batch "
            f"{t2 - t1:.1f}s (index rows {n_idx}, cells {EMB_N_CELLS})",
            flush=True,
        )
        if hist == hists[-1]:
            # the remedy: retrain the quantizer at sqrt(N)-ish cell count,
            # then ingest one more fixed batch against the SAME history
            n_cells = EMB_N_CELLS * max(1, int((hist / hists[0]) ** 0.5))
            t3 = time.perf_counter()
            embeddings_maintenance(store, retrain=True, n_cells=n_cells)
            t4 = time.perf_counter()
            d3 = synth(spark, batch, dim, 20_000_000, "2024-01-03").localCheckpoint(
                eager=True
            )
            t5 = time.perf_counter()
            run_day(spark, store, graph, "2024-01-03", markets=[], resources={"vectors": d3})
            t6 = time.perf_counter()
            print(
                f"hist={hist}: retrain to {n_cells} cells {t4 - t3:.1f}s, "
                f"day3 fixed batch after retrain {t6 - t5:.1f}s",
                flush=True,
            )
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
