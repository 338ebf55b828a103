"""BPE-induction probe (SCALE.md): per-round cost vs corpus size
(operators/text.py bpe_learn).

The module's central claim: the corpus is scanned ONCE (the word
count); every merge round after that runs over the (word, freq) VOCAB
table only, so round cost tracks vocabulary size, not corpus bytes.
This probe ingests corpora of growing document count built from a
BOUNDED vocabulary (the real-text proxy — Heaps-saturated) and times
the 4-round learn separately from the word-count scan. The adversarial
unbounded-vocab case (every word unique) makes the vocab table itself
corpus-sized — the same honest history term as the LM count state
(tools/scale_lm.py), with the same shape: linear in DISTINCT words,
never in corpus bytes.

Usage:
    PYTHONPATH=. python tools/scale_bpe.py [n1,n2,...docs]
Defaults: 20000,80000,320000 docs.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def synth_bounded(spark, n: int):
    """n docs of 12 words drawn (deterministically) from a ~10k-word
    vocabulary — the Heaps-saturated shape of real text."""
    ids = spark.range(0, n).select(F.col("id").alias("doc_id"))
    w = lambda t: F.concat(  # noqa: E731
        F.lit("w"),
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(t), F.col("doc_id").cast("string"))),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        % 10_000,
    )
    return ids.select(
        "doc_id",
        F.concat_ws(" ", *[w(t) for t in "abcdefghijkl"]).alias("text"),
    )


def main() -> int:
    sizes = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [20_000, 80_000, 320_000]
    )

    from aave_etl_spark.operators import text as text_ops
    from aave_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_bpe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in sizes:
        docs = synth_bounded(spark, n).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        vocab = (
            docs.select(F.explode(text_ops.tokens("text")).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("freq"))
        )
        n_vocab = vocab.count()
        scan_wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        merges = text_ops.bpe_learn(docs, n_merges=4).collect()
        learn_wall = time.perf_counter() - t0
        rows.append(
            {
                "docs": n,
                "vocab_words": n_vocab,
                "scan_wall_s": round(scan_wall, 1),
                "learn_wall_s": round(learn_wall, 1),
                "merges": [(m.left, m.right) for m in merges],
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
