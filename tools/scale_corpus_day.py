"""Day-vs-history probe for the daily training-corpus pipeline
(SCALE.md), over the FULL current asset graph — dedup state, DSIR
state, stop-term sketches, benchmark decontamination, gate, packing,
stats, and the training-shard manifest.

Ingests a FIXED-size day-2 batch of unique synthetic docs against
growing day-1 history and times both days. The module's central claim:
per-day cost is history-independent — state reads partition-prune to
earlier days, the band match is exchange-free on the bucketed corpus
side, the near-dup verify is candidate-bound, the eval-digest semi-join
is benchmark-sized, and the only history terms that grow (digest table,
band index, m-row sketch states) are skinny state, never text.

Usage:
    PYTHONPATH=. python tools/scale_corpus_day.py [batch] [hist1,hist2,...]
Defaults: batch=5000, histories 5000,50000.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

#: words with the stopword/variety mix the quality gate keeps
_TMPL = (
    "the {a} of {b} and {c} is a {d} the {e} of {f} and {g} is a {h}"
    " the {i} of {j} and {k} is a {l} with more filler words here to"
    " keep the gate features in range"
)


def synth(spark, n: int, id_base: int, day: str):
    """n unique synthetic docs — md5-derived words so no two docs share
    content (nothing dedups; day 2 pays the full clean/state path)."""
    ids = spark.range(id_base, id_base + n).select(F.col("id").alias("doc_id"))
    w = lambda t: F.substring(
        F.md5(F.concat_ws(":", F.lit(t), F.col("doc_id").cast("string"))), 1, 8
    )
    text = F.format_string(
        _TMPL.replace("{a}", "%s").replace("{b}", "%s").replace("{c}", "%s")
        .replace("{d}", "%s").replace("{e}", "%s").replace("{f}", "%s")
        .replace("{g}", "%s").replace("{h}", "%s").replace("{i}", "%s")
        .replace("{j}", "%s").replace("{k}", "%s").replace("{l}", "%s"),
        *[w(t) for t in "abcdefghijkl"],
    )
    return ids.select(
        "doc_id",
        F.lit("en").alias("lang"),
        text.alias("text"),
        F.to_date(F.lit(day)).alias("day"),
    )


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    hists = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [5000, 50000]
    )

    from aave_etl_spark.io.table_store import TableStore
    from aave_etl_spark.plans.corpus_pipeline import corpus_pipeline_graph
    from aave_etl_spark.plans.orchestration import run_day
    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_corpus_day")
    spark.sparkContext.setLogLevel("ERROR")
    graph = corpus_pipeline_graph()

    for hist in hists:
        root = tempfile.mkdtemp(prefix="scale_corpus_day_")
        store = TableStore(spark, root)
        d1 = synth(spark, hist, 0, "2024-01-01")
        d2 = synth(spark, batch, 10_000_000, "2024-01-02")
        landing = d1.unionByName(d2).localCheckpoint(eager=True)
        # a small fixed eval set so the decontamination arm runs for real.
        # Its shingle space must be DISJOINT from the corpus template —
        # the first draft reused the corpus template and its fixed filler
        # trigrams ("with more filler", ...) contaminated EVERY doc past
        # the 0.2 ratio, barring the whole corpus from packing: the gate
        # doing its job on bad probe data (template boilerplate IS
        # benchmark contamination in shingle space). Every eval trigram
        # here contains a per-doc hashed word, so nothing collides.
        bids = spark.range(20_000_000, 20_000_200).select(
            F.col("id").alias("doc_id")
        )
        bw = lambda t: F.substring(
            F.md5(F.concat_ws(":", F.lit(t), F.col("doc_id").cast("string"))), 1, 8
        )
        bench = bids.select(
            "doc_id",
            F.concat_ws(
                " ", F.lit("eval"), *[bw(f"b{j}") for j in range(12)]
            ).alias("text"),
        )
        res = {"landing": landing, "benchmarks": bench}
        t0 = time.perf_counter()
        run_day(spark, store, graph, "2024-01-01", markets=[], resources=res)
        t1 = time.perf_counter()
        run_day(spark, store, graph, "2024-01-02", markets=[], resources=res)
        t2 = time.perf_counter()
        n_clean = store.read("corpus_clean").count()
        n_shards = store.read("corpus_shards").count()
        print(
            f"hist={hist}: day1 build {t1 - t0:.1f}s, day2 fixed batch "
            f"{t2 - t1:.1f}s (clean {n_clean}, manifest {n_shards})",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
