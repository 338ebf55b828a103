"""Capture .explain('formatted') for exported queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag-dir> [suffix] [query ...]
e.g.   python tools/capture_plans.py plans/r13 before
writes plans/r13/<query>_before.txt for every exported query (or the
subset named on argv).
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    os.makedirs(out_dir, exist_ok=True)

    from aave_etl_spark.queries import exported_queries
    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="aave_etl_spark_plans")
    spark.sparkContext.setLogLevel("ERROR")

    queries = exported_queries()
    names = sys.argv[3:] or list(queries)
    for n in names:
        q = queries[n]
        try:
            df = q.builder(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{n}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
