"""Flat raw-vector probe vs PQ-prefiltered probe (SCALE.md, round 13).

Builds one day-1 history through the embeddings graph (raw IVF + raw PQ
+ UNIT PQ code stores all materialize), then runs the SAME fixed day-2
batch twice — default flat mode (ivf_index_search over raw vectors),
then the ``emb_pq_prefilter`` mode (ADC shortlist over the unit code
store + exact verify on the shortlist's day slices) — and reports both
walls, the drop counts (must be equal), and the AT-REST byte footprint
of the raw index vs the unit code store: the probed-bytes ratio the
composition exists for (~M ints vs d doubles per candidate row).

Usage:
    PYTHONPATH=. python tools/scale_emb_pq.py [dim] [batch] [hist]
Defaults: dim=32, batch=1000, hist=100000.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from tools.scale_emb import synth


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
    return total


def main() -> int:
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    hist = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    from aave_etl_spark.io.table_store import TableStore
    from aave_etl_spark.plans.embeddings_pipeline import (
        EMB_PQ_M,
        EMB_PQ_UNIT,
        embeddings_pipeline_graph,
    )
    from aave_etl_spark.plans.orchestration import run_day
    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_emb_pq")
    spark.sparkContext.setLogLevel("ERROR")
    graph = embeddings_pipeline_graph()

    root = tempfile.mkdtemp(prefix="scale_emb_pq_")
    store = TableStore(spark, root)
    d1 = synth(spark, hist, dim, 0, "2024-01-01")
    # plant 50 exact + 50 rescaled replicas of day-1 vectors in the batch
    d2 = synth(spark, batch - 100, dim, 10_000_000, "2024-01-02")
    from pyspark.sql import functions as F

    rep = (
        synth(spark, 100, dim, 0, "2024-01-02")
        .select(
            (F.col("vec_id") + 20_000_000).alias("vec_id"),
            F.when(
                F.col("vec_id") % 2 == 0,
                F.transform("embedding", lambda x: x * F.lit(3.0)),
            )
            .otherwise(F.col("embedding"))
            .alias("embedding"),
            "day",
        )
    )
    landing = d1.unionByName(d2).unionByName(rep).localCheckpoint(eager=True)
    run_day(spark, store, graph, "2024-01-01", markets=[], resources={"vectors": landing})

    t0 = time.perf_counter()
    run_day(spark, store, graph, "2024-01-02", markets=[], resources={"vectors": landing})
    t_flat = time.perf_counter() - t0
    flat_kept = store.read("emb_clean", where="day = DATE '2024-01-02'").count()

    t1 = time.perf_counter()
    run_day(
        spark, store, graph, "2024-01-02", markets=[],
        resources={"vectors": landing, "emb_pq_prefilter": True},
    )
    t_pq = time.perf_counter() - t1
    pq_kept = store.read("emb_clean", where="day = DATE '2024-01-02'").count()

    raw_b = _dir_bytes(os.path.join(root, "emb_ivf"))
    unit_b = _dir_bytes(os.path.join(root, EMB_PQ_UNIT))
    print(
        f"hist={hist} dim={dim} batch={batch} (100 planted replicas):"
        f" flat day wall {t_flat:.1f}s, PQ-prefilter day wall {t_pq:.1f}s;"
        f" kept flat={flat_kept} pq={pq_kept} (must be equal);"
        f" at-rest bytes raw emb_ivf={raw_b/1e6:.1f}MB vs unit codes"
        f" {EMB_PQ_UNIT}={unit_b/1e6:.1f}MB (ratio {raw_b/max(unit_b,1):.1f}x,"
        f" analytic ~{8*dim}/{EMB_PQ_M} per row)",
        flush=True,
    )
    assert flat_kept == pq_kept, (flat_kept, pq_kept)
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
