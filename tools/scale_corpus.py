"""Regenerate the SCALE.md replicated corpora from a fresh checkout.

Builds the maximally HOSTILE scale fixture: every document/embedding is
replicated ``factor`` times with DISTINCT ids (id + replica * 1_000_000)
but IDENTICAL content, so every near-dup relationship multiplies — the
worst case for dedup operators (every LSH band collides, every semantic
cell fills with replicas). Non-corpus tables are copied through
unchanged so relational queries still run against the same directory.

Usage:
    PYTHONPATH=. python tools/scale_corpus.py /root/testdata/sf0.1 /tmp/scale10 10
    PYTHONPATH=. python tools/scale_corpus.py /root/testdata/sf0.1 /tmp/scale100 100 documents

(the round-7 100x decade replicated only `documents`; pass table names
to restrict). Then measure with tools/scale_probe.py.
"""

from __future__ import annotations

import os
import shutil
import sys

ID_STRIDE = 1_000_000
ID_COLS = {"documents": "doc_id", "embeddings": "vec_id"}
ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    src, dest, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    restricted = len(sys.argv) > 4
    replicate = sys.argv[4].split(",") if restricted else list(ID_COLS)
    if os.path.realpath(src) == os.path.realpath(dest):
        # the replicate branch would COPY a table over the very file it
        # is scanning, destroying the source fixture
        print("src and dest are the same directory — refusing", file=sys.stderr)
        return 2
    os.makedirs(dest, exist_ok=True)

    import duckdb  # column-level replication without a Spark session

    for tbl in ALL_TABLES:
        src_file = os.path.join(src, f"{tbl}.parquet")
        if not os.path.exists(src_file):
            continue
        dst_file = os.path.join(dest, f"{tbl}.parquet")
        if tbl in replicate and tbl in ID_COLS:
            idc = ID_COLS[tbl]
            cols = [r[0] for r in duckdb.sql(
                f"DESCRIBE SELECT * FROM '{src_file}'").fetchall()]
            rest = ", ".join(c for c in cols if c != idc)
            duckdb.sql(
                f"""
                COPY (
                  SELECT t.{idc} + r.r * {ID_STRIDE} AS {idc}, {rest}
                  FROM '{src_file}' t
                  CROSS JOIN (SELECT unnest(range(0, {factor})) AS r) r
                ) TO '{dst_file}' (FORMAT PARQUET)
                """
            )
            n = duckdb.sql(f"SELECT count(*) FROM '{dst_file}'").fetchone()[0]
            print(f"{tbl}: replicated x{factor} -> {n} rows", flush=True)
        elif restricted and os.path.exists(dst_file):
            # ONLY a restricted run (explicit table list) preserves what
            # the dest already holds — it may be a prior replication. A
            # full run refreshes every copy so a regenerated source can't
            # leave the dest an inconsistent fresh/stale mix.
            print(f"{tbl}: already at dest, left untouched (restricted run)", flush=True)
        else:
            if os.path.exists(dst_file) and os.path.samefile(src_file, dst_file):
                print(f"{tbl}: dest is the same file, skipped", flush=True)
                continue
            shutil.copyfile(src_file, dst_file)
            print(f"{tbl}: copied", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
