"""Copy-STORM probe for the round-12 within-batch SEMANTIC dedup pass
(plans/embeddings_pipeline.py _emb_clean; SCALE.md).

The within-batch pass SRP-buckets the day's batch against itself. Its
hard case is NOT a storm of byte-identical vectors (keep_first_by_digest
collapses those map-side upstream) but k RESCALED copies of one vector:
each positive scale changes the bytes (so the exact pass keeps all k)
but preserves every projection sign (so all k land in ONE SRP bucket)
and cosine is scale-invariant (all pairs score 1.0). A naive bucket
self-join scores ~k²/2 Arrow dots inside that bucket; the shipped
two-phase existential form (similarity.within_batch_cosine_drops —
score each vector against its bucket's two smallest member ids first,
all-pairs only for the unresolved remainder) resolves the storm in O(k)
dots with an identical answer set (property-pinned in
tests/test_operators.py).

This probe measures both curves honestly: a fixed batch of unique
vectors plus k planted rescaled copies, (a) one day through the FULL
asset graph (the shipped two-phase pass), (b) the naive
bucketed_cosine_pairs form timed operator-level on the same batch.
Exactly ONE storm survivor (the lowest planted id) must remain in every
configuration.

Usage:
    PYTHONPATH=. python tools/scale_emb_storm.py [dim] [base] [k1,k2,...]
Defaults: dim=32, base=5000 unique vectors, storms 100,1000,5000.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from tools.scale_emb import synth


def main() -> int:
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    storms = (
        [int(x) for x in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else [100, 1000, 5000]
    )

    from aave_etl_spark.io.table_store import TableStore
    from aave_etl_spark.operators import similarity
    from aave_etl_spark.plans.embeddings_pipeline import (
        EMB_DUP_COSINE,
        embeddings_pipeline_graph,
    )
    from aave_etl_spark.plans.orchestration import run_day
    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_emb_storm")
    spark.sparkContext.setLogLevel("ERROR")
    graph = embeddings_pipeline_graph()

    for k in storms:
        root = tempfile.mkdtemp(prefix="scale_emb_storm_")
        store = TableStore(spark, root)
        uniq = synth(spark, base, dim, 0, "2024-01-01")
        # seed id OUTSIDE the unique batch: the storm cluster's lowest
        # member is then the lowest PLANTED id, which must survive
        seed = synth(spark, 1, dim, 999_999, "2024-01-01").select(
            F.col("embedding").alias("_seed")
        )
        # k distinct positive rescales of one vector: different bytes
        # (exact pass keeps all), same SRP bucket, cosine exactly 1.0
        copies = (
            spark.range(40_000_000, 40_000_000 + k)
            .crossJoin(F.broadcast(seed))
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.col("_seed"),
                    lambda x: x * (1.0 + (F.col("id") % 97).cast("double") / 100.0),
                ).alias("embedding"),
                F.to_date(F.lit("2024-01-01")).alias("day"),
            )
        )
        landing = uniq.unionByName(copies).localCheckpoint(eager=True)

        # (b) the naive all-pairs form, operator-level on the same batch
        t0 = time.perf_counter()
        naive = (
            similarity.bucketed_cosine_pairs(landing, min_cos=EMB_DUP_COSINE)
            .select("id_b")
            .distinct()
            .count()
        )
        t1 = time.perf_counter()

        # (a) the shipped two-phase pass through the full asset graph
        t2 = time.perf_counter()
        run_day(
            spark, store, graph, "2024-01-01", markets=[],
            resources={"vectors": landing},
        )
        t3 = time.perf_counter()
        n_clean = store.read("emb_clean").count()
        n_storm_kept = store.read(
            "emb_clean", where="vec_id >= 40000000"
        ).count()
        print(
            f"storm k={k}: naive all-pairs op {t1 - t0:.1f}s "
            f"({naive} drops), two-phase day wall {t3 - t2:.1f}s "
            f"(clean {n_clean}, storm survivors {n_storm_kept})",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
