"""A/B a set of Spark confs over chosen queries (optimization instrumentation).

Usage:
    python tools/conf_experiment.py 'k=v,k2=v2' query [query ...]

Builds the engine session via get_spark(extra_conf=...) in THIS process (so
the conf set is the only variable vs. a baseline run with ''), runs each
query once as warm-up and twice measured (min reported), prints TSV.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")
    conf_arg, names = sys.argv[1], sys.argv[2:]
    extra = dict(kv.split("=", 1) for kv in conf_arg.split(",") if kv)

    from aave_etl_spark.queries.registry import all_queries
    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="aave_etl_spark_confexp", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy("l_returnflag").agg(
        {"l_quantity": "sum"}
    ).write.format("noop").mode("overwrite").save()

    def once(n: str) -> float:
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        queries[n].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    print(f"# conf: {extra or 'baseline'}")
    for n in names:
        once(n)  # warm-up (store builds etc.)
        a, b = once(n), once(n)
        print(f"{n}\t{min(a, b):.3f}\t({a:.3f}, {b:.3f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
