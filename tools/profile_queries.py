"""Per-query phase profiler (optimization round instrumentation).

For each exported query (or the names given on argv), times three phases:

- build:   builder(spark, sf_dir) — driver-side DataFrame construction,
           including any eager fixture jobs / store builds the builder runs
- plan:    forcing the executed plan (Catalyst analyze+optimize+physical)
- exec:    the noop-sink write (actual execution; guide §1.4)

and counts the Spark jobs each phase launched (statusTracker job ids), so
overhead-dominated queries (many tiny jobs, heavy plan time) separate from
genuinely execution-bound ones. Run AFTER a warm-up so session-scoped
scratch stores are already built: the numbers then match the bench's
median passes, not its cold first pass.

Usage: python tools/profile_queries.py [query ...]
Output: one line per query, TSV: name build_s plan_s exec_s jobs_build
        jobs_plan jobs_exec
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")

    from aave_etl_spark.queries.registry import all_queries
    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="aave_etl_spark_profile")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    # full registry so family PARTS (export=False) can be profiled alongside
    # their heads; with no argv, profile the exported surface only
    queries = all_queries()
    if not sys.argv[1:]:
        from aave_etl_spark.queries import exported_queries

        queries = exported_queries()
    names = sys.argv[1:] or list(queries)

    # warm-up: JVM + any session-scoped scratch stores the builders share
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy("l_returnflag").agg(
        {"l_quantity": "sum"}
    ).write.format("noop").mode("overwrite").save()
    for n in names:
        try:
            queries[n].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001
            print(f"{n}\tWARMUP-FAIL\t{type(exc).__name__}: {exc}", flush=True)

    def njobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return len(ids)

    print("name\tbuild_s\tplan_s\texec_s\tjobs_build\tjobs_plan\tjobs_exec")
    for n in names:
        q = queries[n]
        spark._jvm.System.gc()
        j0 = njobs()
        t0 = time.perf_counter()
        df = q.builder(spark, sf_dir)
        t1 = time.perf_counter()
        j1 = njobs()
        # force full Catalyst pipeline without executing
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        j2 = njobs()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        j3 = njobs()
        print(
            f"{n}\t{t1 - t0:.3f}\t{t2 - t1:.3f}\t{t3 - t2:.3f}"
            f"\t{j1 - j0}\t{j2 - j1}\t{j3 - j2}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
