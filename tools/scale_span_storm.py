"""Boilerplate-STORM probe for the span-dedup REWRITE pass
(operators/dedup.py span_dedup_rewrite; SCALE.md).

Span dedup's hot case is corpus-wide boilerplate: k docs all carrying
the SAME span (a license header, a nav bar, a cookie banner). In the
window-hash formulation a span repeated k times contributes k rows to
the hash groupBy and k-1 flagged windows — LINEAR by construction,
unlike pair-blocking joins which would fan out ~k²/2 inside the hot
hash. This probe measures that curve honestly: a fixed base of unique
docs plus k docs sharing one 12-token boilerplate span (each with
unique surrounding text), operator-level wall for growing k, asserting
the 'except one' contract (exactly one sharer — the lowest doc_id —
keeps the span; every other sharer loses exactly the span's tokens).

Usage:
    PYTHONPATH=. python tools/scale_span_storm.py [base] [k1,k2,...]
Defaults: base=5000 unique docs, storms 1000,10000,100000.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def main() -> int:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    storms = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1000, 10000, 100000]
    )

    from aave_etl_spark.operators.dedup import span_dedup_rewrite
    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_span_storm")
    spark.sparkContext.setLogLevel("ERROR")

    boiler = (
        "this site uses cookies to improve your experience accept all to"
        " continue"
    )
    n_boiler = len(boiler.split(" "))

    def synth_unique(n: int):
        # ~16 unique tokens per doc from md5 nibbles — no shared windows
        return spark.range(0, n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("id").cast("string"), F.lit(i))),
                        1,
                        10,
                    )
                    for i in range(16)
                ],
            ).alias("text"),
        )

    for k in storms:
        uniq = synth_unique(base)
        sharers = spark.range(50_000_000, 50_000_000 + k).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.substring(F.md5(F.col("id").cast("string")), 1, 10),
                F.lit(boiler),
                F.substring(F.md5(F.concat_ws("x", F.col("id").cast("string"))), 1, 10),
            ).alias("text"),
        )
        df = uniq.unionByName(sharers).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        out = span_dedup_rewrite(df, n=8)
        agg = (
            out.filter(F.col("doc_id") >= 50_000_000)
            .agg(
                F.sum(F.when(F.col("n_removed") == 0, 1).otherwise(0)).alias("kept"),
                F.sum("n_removed").alias("removed"),
            )
            .collect()[0]
        )
        t1 = time.perf_counter()
        # 'except one': the lowest sharer keeps the span; window overlap
        # means later sharers lose the span plus covered neighbours
        print(
            f"storm k={k}: rewrite wall {t1 - t0:.1f}s (sharers keeping all"
            f" tokens {agg.kept}, tokens removed {agg.removed},"
            f" span len {n_boiler})",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
