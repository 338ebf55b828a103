"""Measure any registered query against any corpus directory — the
harness behind every SCALE.md decade row, now reproducible from a fresh
checkout.

Usage (from the repo root):
    PYTHONPATH=. python tools/scale_probe.py <sf_dir> <name[,name...]> [runs]

e.g. regenerate the MinHash-index decade rows:
    PYTHONPATH=. python tools/scale_corpus.py /root/testdata/sf0.1 /tmp/scale10 10
    PYTHONPATH=. python tools/scale_probe.py /root/testdata/sf0.1 llm_minhash_index_match,llm_minhash_lsh 4
    PYTHONPATH=. python tools/scale_probe.py /tmp/scale10 llm_minhash_index_match,llm_minhash_lsh 4

Per-query: ``runs`` noop-sink executions, first run discarded (cold
Catalyst compile / page-cache fill), median of the rest. IMPORTANT:
never run two Spark JVMs concurrently on the same box — CPU contention
inflates wall times 5-10x and the numbers stop being comparable; for A
vs B claims, measure BOTH in the same session (historical rows from
different sessions are not load-fair).

Special names (scale forms without registry entries):
    dsir_approx — dsir_importance_resample(approximate=True) at m=256
    bm25_inflight — bm25_retrieve rebuilt-per-run (the at-rest index's
                    in-flight twin, for index-vs-inflight comparisons)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    from aave_etl_spark.operators import sampling
    from aave_etl_spark.queries.registry import all_queries, t

    allq = all_queries()
    for name in names:
        walls = []
        for _ in range(runs):
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            if name == "dsir_approx":
                df = sampling.dsir_importance_resample(
                    t(spark, sf_dir, "documents"), target_pred="lang = 'en'",
                    m=256, keep_frac=0.25, approximate=True,
                )
            elif name == "bm25_inflight":
                # the in-flight twin of llm_bm25_index_search: same probe,
                # but the postings rebuild from text EVERY run — the corpus
                # re-scan the at-rest index amortizes away
                from aave_etl_spark.operators import text as text_ops
                from pyspark.sql import functions as F

                docs = t(spark, sf_dir, "documents")
                df = text_ops.bm25_retrieve(
                    docs, docs.filter(F.col("doc_id") < 8), k=10
                )
            else:
                df = allq[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        med = statistics.median(walls[1:]) if len(walls) > 1 else walls[0]
        print(
            f"RESULT {name} {sf_dir} median_last{len(walls) - 1}={med:.2f}s"
            f" all={[round(w, 2) for w in walls]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
