"""Benchmark runner (driver contract).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], materializing each
result via the `noop` sink (full execution, no write cost, nothing
collected to the driver), and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

A warm-up pass over `lineitem` triggers JVM/codegen warm-up so per-query
times measure the plan, not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")

    from aave_etl_spark.queries import exported_queries
    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="aave_etl_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM, codegen, shuffle machinery, parquet footer reads — a
    # representative agg so the first measured query doesn't pay JIT warm-up.
    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg({"l_quantity": "sum"})
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    # exported set only — the driver-facing surface; export=False singleton
    # parts would double-count work their family head already executes
    for name, q in exported_queries().items():
        # Isolate queries from each other's heap garbage: without this,
        # whichever query follows a heavy one pays its GC debt and the
        # per-query numbers depend on registry order.
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        try:
            q.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            failures[name] = f"{type(exc).__name__}: {exc}"

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    out = {
        "metric": "total wall-clock over all registered queries (noop sink)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
