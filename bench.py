"""Benchmark runner (driver contract).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], materializing each
result via the `noop` sink (full execution, no write cost, nothing
collected to the driver), and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 5) in
round-robin order and `queries` reports the per-query MEDIAN — this box's
wall-clock noise is ±50% run-to-run, so single-shot timings have muddied
two rounds of cross-round comparisons (VERDICT r3). Round-robin (not
back-to-back repeats) so a transient system hiccup lands on different
queries in different passes instead of poisoning all repeats of one.
`value` is the sum of medians; `spread` records each pass's total so the
noise floor itself is visible in the artifact.

A warm-up pass over `lineitem` triggers JVM/codegen warm-up so the first
measured query doesn't pay JIT warm-up.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
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

    def run_once(builder) -> float:
        # Isolate queries from each other's heap garbage: without this,
        # whichever query follows a heavy one pays its GC debt and the
        # per-query numbers depend on registry order.
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    samples: dict[str, list[float]] = {}
    failures: dict[str, str] = {}
    pass_totals: list[float] = []
    # exported set only — the driver-facing surface; export=False singleton
    # parts would double-count work their family head already executes
    queries = exported_queries()
    for _ in range(n_runs):
        pass_t0 = time.perf_counter()
        for name, q in queries.items():
            if name in failures:
                continue
            try:
                samples.setdefault(name, []).append(run_once(q.builder))
            except Exception as exc:  # noqa: BLE001
                failures[name] = f"{type(exc).__name__}: {exc}"
                # a query is either timed or failed, never both (earlier
                # passes' samples would otherwise double-report it)
                samples.pop(name, None)
        pass_totals.append(round(time.perf_counter() - pass_t0, 3))

    timings = {name: round(statistics.median(ts), 3) for name, ts in samples.items()}

    # Per-PART attribution for the union-aligned family heads: one extra
    # single-shot pass over each head's export=False singleton builders so
    # cross-round head-total growth is attributable to the parts that
    # changed (VERDICT r6 "Next round" #5). Single-shot (not medians) —
    # attribution detail, not the headline number.
    from aave_etl_spark.queries.families import FAMILY_PARTS
    from aave_etl_spark.queries.registry import all_queries

    allq = all_queries()
    parts_out: dict[str, dict[str, float]] = {}
    # attribution-only failures: recorded in the artifact but NOT in the
    # exit code — the headline number is the 50 exported heads above, and
    # a part hiccup in the extra single-shot pass doesn't invalidate it
    part_failures: dict[str, str] = {}
    for head, parts in FAMILY_PARTS.items():
        if head in failures:
            continue
        breakdown: dict[str, float] = {}
        for tag, qname in parts:
            try:
                breakdown[tag] = round(run_once(allq[qname].builder), 3)
            except Exception as exc:  # noqa: BLE001
                part_failures[f"{head}.{tag}"] = f"{type(exc).__name__}: {exc}"
        parts_out[head] = breakdown

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    # compact attribution summary: the 10 most expensive parts across
    # every family head, 2dp. Lands in BENCH_LAST/_full/HISTORY only —
    # r12 proved even these ~300 bytes push the stdout line past the
    # driver's 2000-byte tail window (50 query medians alone are ~1.8 KB),
    # so NOTHING beyond the r11-shaped payload may ride stdout.
    top_parts = dict(
        sorted(
            (
                (f"{head}.{tag}", round(t, 2))
                for head, breakdown in parts_out.items()
                for tag, t in breakdown.items()
            ),
            key=lambda kv: kv[1],
            reverse=True,
        )[:10]
    )

    out = {
        "metric": f"total query wall (noop sink; median of {n_runs})",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs": n_runs,
        # the first pass pays cold costs the medians exclude (Catalyst
        # first-compile, code-cache JIT, page-cache fill, the IVF
        # build-once) — flag it so cross-round readers don't misread the
        # first pass_total as a regression (VERDICT r5 "Next round" #8)
        "spread": {"pass_totals": pass_totals, "cold_first_pass": True},
        # single-shot per-part walls inside each family head (attribution
        # only; medians above remain the citable numbers)
        "parts": parts_out,
        # the 10 most expensive parts (file payloads only — stripped from
        # stdout along with `parts` below)
        "parts_top": top_parts,
    }
    if failures:
        out["failures"] = failures
    if part_failures:
        out["part_failures"] = part_failures
    # The driver captures a byte-bounded TAIL of stdout (2000 bytes; the
    # BENCH_r10 artifact's `tail` field measures it); the r7 `parts`
    # payload pushed the one-line JSON past that window and the round lost
    # its headline medians (BENCH_r07 `parsed: null`) — a tail keeps the
    # END of output, so an over-long line loses its FRONT, where metric /
    # value / queries live. 50 query medians alone run ~1.8 KB, so parts
    # (~4 KB) can NEVER ride the stdout line. Instead the FULL payload
    # (incl. parts) lands in three committed files:
    #   - BENCH_LAST.json      — overwritten per run (latest full payload)
    #   - BENCH_HISTORY.jsonl  — appended per run, timestamped (cross-
    #     round per-part attribution without git archaeology, VERDICT r9)
    #   - BENCH_r{NN}_full.json — the ROUND-STAMPED full payload (VERDICT
    #     r10 #2: the r-numbered file a judge opens first must carry
    #     parts; the driver's own BENCH_r{NN}.json holds only the parsed
    #     stdout tail, so bench.py stamps the sibling itself, inferring
    #     NN as max existing BENCH_r*.json + 1. ORDERING CONTRACT: the
    #     driver writes BENCH_r{NN}.json at every round's end, so by the
    #     time round NN+1 benches, NN exists and the inference advances;
    #     re-benching within a round deliberately refreshes the same
    #     _full file)
    # and stdout's one JSON line stays compact with a pointer.
    try:
        import glob
        import re

        repo_dir = os.path.dirname(os.path.abspath(__file__))
        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))
            if (m := re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p)))
        ]
        full_name = f"BENCH_r{max(rounds, default=0) + 1:02d}_full.json"
        with open(os.path.join(repo_dir, "BENCH_LAST.json"), "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
        with open(os.path.join(repo_dir, full_name), "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
        with open(os.path.join(repo_dir, "BENCH_HISTORY.jsonl"), "a") as fh:
            json.dump({"ts": int(time.time()), **out}, fh)
            fh.write("\n")
        # stdout carries ONLY the contract keys (metric/value/unit/
        # queries/sf + failures): the r12 artifact lost its headline
        # because parts_top (~300 bytes) pushed the line past the driver's
        # 2000-byte tail window, and round 13 found the r12-shaped line
        # had crept to 2,253 bytes again once two new heads joined the
        # queries dict — 50 query medians are ~1.75 KB even with compact
        # separators, so there is NO headroom for extras at all. runs /
        # spread / parts / parts_top live in the three committed files
        # only; the line is asserted under the window with margin.
        out = {
            k: v
            for k, v in out.items()
            if k in ("metric", "value", "unit", "queries", "sf", "failures")
        }
    except OSError:
        # a read-only checkout still prints only the contract keys
        out = {
            k: v
            for k, v in out.items()
            if k in ("metric", "value", "unit", "queries", "sf", "failures")
        }
    line = json.dumps(out, separators=(",", ":"))
    # print FIRST (a slightly-over line may still parse inside the
    # driver's 2000-byte tail window), THEN fail loudly: a bare assert
    # would both vanish under python -O and kill the run before anything
    # printed — the exact failure mode the guard exists to prevent
    print(line, flush=True)
    if len(line) > 1900:
        raise RuntimeError(
            f"bench stdout line is {len(line)} bytes — over the driver's"
            " 2000-byte tail window (minus margin); trim keys before the"
            " round loses its headline like r7/r12"
        )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
