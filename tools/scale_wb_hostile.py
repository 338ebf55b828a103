"""HOSTILE mixed-bucket probe for the two-phase within-batch dedup
passes (operators/dedup.within_batch_near_dup_drops,
operators/similarity.within_batch_cosine_drops; SCALE.md round 13).

The storm probes (scale_wb_storm / scale_emb_storm) measure the case
the two-phase form EXISTS for: k near-copies that resolve against the
bucket minimum in phase 1. This probe measures the adversarial
OPPOSITE — k mutually-DISSIMILAR members forced to share buckets, so
phase 1 resolves nothing and phase 2 degrades to the naive bucketed
all-pairs join (its documented bound: the two-phase form never does
MORE than naive + one O(k) probe pass; a genuinely mixed mega-bucket
pays naive).

Doc form: every doc shares a 20-shingle base vocabulary plus 25 unique
shingles — pairwise Jaccard ~0.28 (< 0.5 threshold: NOTHING drops),
while the shared shingles dominate enough band minima to pile large
mixed buckets. Vector form: a shared mean direction + ~35% uniform
noise — pairwise cosine ~0.99 (< 0.999: nothing drops) while most
vectors share one SRP bucket.

Usage:
    PYTHONPATH=. python tools/scale_wb_hostile.py [k1,k2,...]
Defaults: 500,2000,8000.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def main() -> int:
    ks = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [500, 2000, 8000]
    )

    from aave_etl_spark.operators.dedup import (
        within_batch_near_dup_drops,
        word_shingles,
    )
    from aave_etl_spark.operators.similarity import within_batch_cosine_drops
    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_wb_hostile")
    spark.sparkContext.setLogLevel("ERROR")

    base_words = " ".join(f"shared{i:02d}" for i in range(22))
    for k in ks:
        docs = spark.range(0, k).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.lit(base_words),
                *[
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("id").cast("string"), F.lit(j))),
                        1,
                        10,
                    )
                    for j in range(25)
                ],
            ).alias("text"),
        ).localCheckpoint(eager=True)
        sh = word_shingles(docs, n=3)
        t0 = time.perf_counter()
        n_drop = within_batch_near_dup_drops(sh, threshold=0.5).count()
        t1 = time.perf_counter()
        assert n_drop == 0, n_drop  # mutually dissimilar: nothing may drop

        dim = 16
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
        vecs = (
            spark.range(0, k)
            .select(F.col("id").alias("vec_id"))
            .select(
                "vec_id",
                # 1 + 0.35*U(-0.5,0.5) per coord: pairwise cosine ~0.99
                # (safely under 0.999 — nothing drops) while the shared
                # mean direction keeps most vectors in one SRP bucket
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: F.lit(1.0) + F.lit(0.35) * elem(i),
                ).alias("embedding"),
            )
            .localCheckpoint(eager=True)
        )
        t2 = time.perf_counter()
        v_drop = within_batch_cosine_drops(vecs, min_cos=0.999).count()
        t3 = time.perf_counter()
        assert v_drop == 0, v_drop
        print(
            f"hostile k={k}: doc form {t1 - t0:.1f}s, vector form"
            f" {t3 - t2:.1f}s (drops 0/0 as required)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
