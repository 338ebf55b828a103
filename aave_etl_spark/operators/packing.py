"""Greedy sequence packing: batch documents into fixed token budgets.

Training pipelines feed models fixed-size context windows; feeding one
short document per window wastes most of the tokens. Packing concatenates
documents into windows up to a token capacity. The deterministic variant
here is FIRST-FIT IN ID ORDER within a group (e.g. language): append the
next document to the current pack unless it would overflow, else start a
new pack. An oversized document (n_tokens > capacity) gets a pack of its
own — never split, never dropped.

Why ``applyInPandas``: the pack assignment is a running sum with reset — a
sequential recurrence Spark SQL cannot express without a recursive join
(window cumsum has no reset). The recurrence is per-GROUP, so the
distributed shape is exactly grouped-map: one shuffle on the group key,
then an O(rows) Arrow-batched loop per group. Groups (languages, shards,
sources) are the parallelism unit — at 100 TB you pack within shard-sized
groups, thousands of them, so every executor core stays busy and no group
need fit the driver. The DuckDB oracle mirrors the recurrence with a
recursive CTE (tests/oracle parity), which is also the proof the semantics
are engine-portable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "{g} string, {i} long, {t} long, pack_id long, pack_offset long"
)


def greedy_pack(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    capacity: int = 256,
) -> DataFrame:
    """First-fit packing of (group, id, n_tokens) rows into token budgets.

    Returns (group, id, n_tokens, pack_id, pack_offset): pack_id is 0-based
    per group, pack_offset is the token position of the document inside its
    pack. Documents are packed in ascending id order — a total order, so
    the output is unique and reproducible.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        pack_ids, offsets = [], []
        pack_id, cum = 0, 0
        for n in pdf[tokens_col]:
            n = int(n)
            if cum > 0 and cum + n > capacity:
                pack_id += 1
                cum = 0
            pack_ids.append(pack_id)
            offsets.append(cum)
            cum += n
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_offset"] = pd.Series(offsets, dtype="int64")
        return pdf[[group_col, id_col, tokens_col, "pack_id", "pack_offset"]]

    base = df.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(id_col).cast("long").alias(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
    )
    return base.groupBy(group_col).applyInPandas(
        _pack, _OUT_SCHEMA.format(g=group_col, i=id_col, t=tokens_col)
    )
