"""Structured Streaming tests: availableNow drain over real parquet,
in-stream snapshot dedup, session windows with watermark."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from aave_etl_spark.streaming import (
    dedup_snapshot_stream,
    sessionized_stream,
    stream_lake_table,
)
from aave_etl_spark.streaming.micro_batch import run_available_now


def _write_snapshot(spark, path, rows):
    spark.createDataFrame(
        rows, "market string, reserve string, fetch_time timestamp, value double"
    ).write.mode("append").parquet(path)


def test_available_now_drains_and_dedups(spark, tmp_path):
    lake = str(tmp_path / "lake")
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    # duplicate (key, fetch_time) rows simulating an at-least-once replay
    _write_snapshot(
        spark,
        lake,
        [
            ("m1", "0xa", t0, 1.0),
            ("m1", "0xa", t0, 1.0),
            ("m1", "0xa", t0 + timedelta(minutes=5), 2.0),
            ("m2", "0xb", t0, 3.0),
        ],
    )
    schema = spark.read.parquet(lake).schema
    out_dir = str(tmp_path / "out")
    stream = stream_lake_table(spark, lake, schema)
    assert stream.isStreaming
    deduped = dedup_snapshot_stream(stream, ["market", "reserve"])
    q = run_available_now(
        deduped, str(tmp_path / "ckpt"), query_name="snap_test",
        fmt="parquet", path=out_dir,
    )
    q.awaitTermination(60)
    out = spark.read.parquet(out_dir)
    assert out.count() == 3  # replayed duplicate dropped
    assert out.filter((F.col("market") == "m1") & (F.col("value") == 1.0)).count() == 1

    # restart with new files: checkpoint makes the second drain incremental
    _write_snapshot(spark, lake, [("m3", "0xc", t0, 4.0)])
    q2 = run_available_now(
        stream_lake_table(spark, lake, schema)
        .transform(lambda df: dedup_snapshot_stream(df, ["market", "reserve"])),
        str(tmp_path / "ckpt"),
        query_name="snap_test2",
        fmt="parquet",
        path=out_dir,
    )
    q2.awaitTermination(60)
    out2 = spark.read.parquet(out_dir)
    assert out2.count() == 4  # exactly one new row appended after restart


def test_sessionized_stream(spark, tmp_path):
    lake = str(tmp_path / "events")
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    spark.createDataFrame(
        [
            (1, t0, 1.0),
            (1, t0 + timedelta(minutes=10), 2.0),   # same session (gap < 30m)
            (1, t0 + timedelta(hours=3), 5.0),      # new session
            (2, t0, 7.0),
        ],
        "user_id long, ts timestamp, value double",
    ).write.parquet(lake)
    schema = spark.read.parquet(lake).schema
    sessions = sessionized_stream(stream_lake_table(spark, lake, schema))
    q = run_available_now(
        sessions, str(tmp_path / "ckpt2"), output_mode="complete", query_name="sess_test"
    )
    q.awaitTermination(60)
    out = {(r.user_id, r.session_start): r for r in spark.sql("select * from sess_test").collect()}
    assert len(out) == 3
    first = out[(1, t0)]
    assert first.n_events == 2
    assert first.session_value == 3.0


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-key totals carry across checkpointed
    availableNow drains (state survives restart), one emitted row per key
    per batch it appears in."""
    from aave_etl_spark.streaming import stateful_running_totals

    lake = str(tmp_path / "lake")
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    spark.createDataFrame(
        [(1, t0, 1.0), (1, t0 + timedelta(minutes=1), 2.0), (2, t0, 3.0)],
        "user_id bigint, ts timestamp, value double",
    ).write.mode("append").parquet(lake)
    schema = spark.read.parquet(lake).schema
    out_dir = str(tmp_path / "out")

    def drain(name):
        q = run_available_now(
            stateful_running_totals(stream_lake_table(spark, lake, schema)),
            str(tmp_path / "ckpt"),
            query_name=name,
            fmt="parquet",
            path=out_dir,
        )
        q.awaitTermination(120)

    drain("stateful1")
    out1 = {r.user_id: (r.total, r.n_events) for r in spark.read.parquet(out_dir).collect()}
    assert out1 == {1: (3.0, 2), 2: (3.0, 1)}

    # second drain: only user 1 gets new events; its state accumulates
    spark.createDataFrame(
        [(1, t0 + timedelta(minutes=2), 4.0)],
        "user_id bigint, ts timestamp, value double",
    ).write.mode("append").parquet(lake)
    drain("stateful2")
    rows = spark.read.parquet(out_dir).collect()
    assert (1, 7.0, 3) in {(r.user_id, r.total, r.n_events) for r in rows}
    # user 2 emitted nothing new in batch 2
    assert sum(1 for r in rows if r.user_id == 2) == 1


def test_incremental_corpus_ingest_dedups_against_store(spark, tmp_path):
    from aave_etl_spark.io.table_store import TableStore
    from aave_etl_spark.streaming.micro_batch import (
        incremental_corpus_ingest,
        stream_lake_table,
    )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    store = TableStore(spark, str(tmp_path / "warehouse"))
    # seed corpus: docs A, B (digest column as the ingest writes it)
    seed = spark.createDataFrame(
        [(1, "doc alpha"), (2, "doc beta")], "doc_id long, text string"
    ).withColumn("digest", F.md5(F.col("text")))
    store.write(seed, "corpus", append_only=True)

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    # batch 1: B again (already in corpus), C twice (within-batch dup)
    spark.createDataFrame(
        [(3, "doc beta"), (4, "doc gamma"), (5, "doc gamma")], schema
    ).write.mode("append").parquet(str(inbox))

    q = incremental_corpus_ingest(
        store, stream_lake_table(spark, str(inbox), schema), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = store.read("corpus").select("text").collect()
    assert sorted(r.text for r in got) == ["doc alpha", "doc beta", "doc gamma"]

    # batch 2: C again + new D; restart with the SAME checkpoint
    spark.createDataFrame([(6, "doc gamma"), (7, "doc delta")], schema).write.mode(
        "append"
    ).parquet(str(inbox))
    q2 = incremental_corpus_ingest(
        store, stream_lake_table(spark, str(inbox), schema), str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    got2 = store.read("corpus").select("text").collect()
    assert sorted(r.text for r in got2) == [
        "doc alpha",
        "doc beta",
        "doc delta",
        "doc gamma",
    ]


def test_incremental_embedding_ingest_dedups_and_redelivery_noop(spark, tmp_path):
    """Streaming ANN-index maintenance: batch 1 builds the frozen-
    quantizer index; batch 2's exact replica, rescaled replica, and
    within-batch duplicate are dropped (semantic anti-join against the
    accumulated index) while genuinely new vectors append under the
    stored centroids; RE-DELIVERING already-ingested content appends
    nothing (the anti-join is the at-least-once idempotence mechanism)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    from aave_etl_spark.io.table_store import TableStore
    from aave_etl_spark.streaming.micro_batch import (
        incremental_embedding_ingest,
        stream_lake_table,
    )

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    store = TableStore(spark, str(tmp_path / "wh"))
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    e = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0],
        3: [0.6, 0.64, 0.0, 0.0],
    }
    new_a, new_b = [0.0, 0.0, 0.5, 0.8], [0.5, -0.5, 0.5, -0.5]

    def drain(rows):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).write.mode("append").parquet(landing)
        q = incremental_embedding_ingest(
            store, stream_lake_table(spark, landing, schema), ckpt, n_cells=4
        )
        assert q.awaitTermination(120)

    drain([(i, e[i]) for i in range(4)])
    assert store.read("emb_ivf").count() == 4

    drain(
        [
            (10, e[1]),                      # exact replica -> dropped
            (11, [x * 3.0 for x in e[2]]),   # rescaled replica -> dropped
            (12, new_a),                     # survives
            (13, new_b),                     # survives
            (14, new_b),                     # within-batch copy -> dropped
            (15, None),                      # NULL embedding -> dropped
        ]
    )
    idx = store.read("emb_ivf")
    assert {r.vec_id for r in idx.collect()} == {0, 1, 2, 3, 12, 13}

    # re-delivery of already-ingested content (fresh files, fresh ids the
    # sink has under OTHER ids) appends nothing
    drain([(20, e[0]), (21, new_a), (22, [x * 0.5 for x in new_b])])
    assert {r.vec_id for r in store.read("emb_ivf").collect()} == {0, 1, 2, 3, 12, 13}

    # SAME-ID redelivery (the at-least-once replay shape: a retried
    # micro-batch carries the identical rows, ids included) appends
    # nothing — each replayed vector's self-match IS its cosine-1.0
    # duplicate evidence, so the search must not exclude it (round-11
    # ADVICE: with exclude_self the anti-join misses every same-id
    # replay whose nearest OTHER neighbor is under the threshold, and
    # append_only duplicates the (vec_id, cell) rows)
    drain([(12, new_a), (13, new_b), (0, e[0])])
    idx3 = store.read("emb_ivf")
    assert idx3.count() == 6
    assert {r.vec_id for r in idx3.collect()} == {0, 1, 2, 3, 12, 13}
