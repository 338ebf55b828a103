"""Driver-checked queries for the warehouse/datamart operator patterns:
inline struct-array dims (sm_token_holder_distro.sql:53-66), ordered
collect-to-list (protocol_data_warehouse.py:368-374), and the np.interp
grouped interpolation (:379) — each with a DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from aave_etl_spark.queries.registry import register, t


# ---------------------------------------------------------------------------
# §2.9/§2.12 inline(array(struct...)) literal dim + CASE bucketing + ratio
# aggregation — the sm_token_holder_distro shape on the customer table.
# ---------------------------------------------------------------------------
@register(
    "holder_distro_buckets",
    export=False,  # driver slot held by its family head (queries/families.py)
    oracle="""
    WITH holders AS (
      SELECT c_custkey, c_mktsegment,
             CASE
               WHEN c_acctbal > 9000 THEN 'bal >9k'
               WHEN c_acctbal > 5000 THEN 'bal 5k-9k'
               WHEN c_acctbal > 0 THEN 'bal 0-5k'
               ELSE 'bal <=0'
             END AS bucket
      FROM customer
    ),
    sort_orders AS (
      SELECT * FROM (VALUES ('bal >9k', 4), ('bal 5k-9k', 3), ('bal 0-5k', 2), ('bal <=0', 1))
        AS s(bucket, sort_order)
    ),
    agg AS (
      SELECT c_mktsegment, bucket, CAST(count(*) AS BIGINT) AS n_customers
      FROM holders GROUP BY c_mktsegment, bucket
    ),
    totals AS (
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS total FROM holders GROUP BY c_mktsegment
    )
    SELECT a.c_mktsegment, a.bucket, CAST(s.sort_order AS INT) AS sort_order,
           a.n_customers,
           CAST(a.n_customers AS DOUBLE) / t.total AS customer_share
    FROM agg a
    LEFT JOIN sort_orders s ON a.bucket = s.bucket
    LEFT JOIN totals t ON a.c_mktsegment = t.c_mktsegment
    """,
    doc="§2.12 sm_token_holder_distro shape: CASE bucketing + inline(array(struct)) sort dim + share ratios",
)
def holder_distro_buckets(spark, sf_dir):
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH holders AS (
          SELECT c_custkey, c_mktsegment,
                 CASE
                   WHEN c_acctbal > 9000 THEN 'bal >9k'
                   WHEN c_acctbal > 5000 THEN 'bal 5k-9k'
                   WHEN c_acctbal > 0 THEN 'bal 0-5k'
                   ELSE 'bal <=0'
                 END AS bucket
          FROM customer
        ),
        sort_orders AS (
          SELECT inline(array(
            struct('bal >9k' AS bucket, 4 AS sort_order),
            struct('bal 5k-9k' AS bucket, 3 AS sort_order),
            struct('bal 0-5k' AS bucket, 2 AS sort_order),
            struct('bal <=0' AS bucket, 1 AS sort_order)))
        ),
        agg AS (
          SELECT c_mktsegment, bucket, count(*) AS n_customers
          FROM holders GROUP BY c_mktsegment, bucket
        ),
        totals AS (
          SELECT c_mktsegment, count(*) AS total FROM holders GROUP BY c_mktsegment
        )
        SELECT a.c_mktsegment, a.bucket, s.sort_order, a.n_customers,
               CAST(a.n_customers AS DOUBLE) / t.total AS customer_share
        FROM agg a
        LEFT JOIN sort_orders s ON a.bucket = s.bucket
        LEFT JOIN totals t ON a.c_mktsegment = t.c_mktsegment
        """
    )


# ---------------------------------------------------------------------------
# §2.4 group-by collect-to-list with pinned order (lambda x: x.to_list(),
# protocol_data_warehouse.py:368-374) — fingerprinted so the hash compare is
# representation-independent.
# ---------------------------------------------------------------------------
@register(
    "ordered_collect_fingerprint",
    export=False,  # driver slot held by its family head (queries/families.py)
    oracle="""
    SELECT user_id,
           md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)) AS events_md5,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    """,
    doc="§2.4 collect-to-list ordered via sort_array(collect_list) (protocol_data_warehouse.py:368-374)",
)
def ordered_collect_fingerprint(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.md5(
            F.concat_ws(
                ",",
                # sort numerically BEFORE stringifying — a string sort would
                # order '10' before '9' and diverge from the oracle's
                # ORDER BY event_id
                F.transform(
                    F.sort_array(F.collect_list("event_id")), lambda x: x.cast("string")
                ),
            )
        ).alias("events_md5"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# §2.11 grouped-map np.interp (liquidity_depth, protocol_data_warehouse.py:
# 362-395) — applyInPandas with a pure-SQL piecewise-linear oracle.
# ---------------------------------------------------------------------------
_TARGETS = [2.5, 5.0, 10.0, 50.0, 120.0]

_INTERP_ORACLE = f"""
WITH pts AS (
  SELECT l_returnflag AS grp,
         CAST(l_quantity AS DOUBLE) AS x,
         avg(l_extendedprice) AS y
  FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS DOUBLE)
),
tg AS (SELECT unnest([{", ".join(str(x) for x in _TARGETS)}]) AS tx),
lo AS (
  SELECT p.grp, t.tx, max(p.x) AS x0
  FROM pts p JOIN tg t ON p.x <= t.tx GROUP BY p.grp, t.tx
),
hi AS (
  SELECT p.grp, t.tx, min(p.x) AS x1
  FROM pts p JOIN tg t ON p.x >= t.tx GROUP BY p.grp, t.tx
),
grid AS (SELECT g.grp, t.tx FROM (SELECT DISTINCT grp FROM pts) g CROSS JOIN tg t)
SELECT gr.grp AS grp, gr.tx AS target_x,
       round(CASE
         WHEN lo.x0 IS NULL THEN y1.y           -- clamp below range (np.interp)
         WHEN hi.x1 IS NULL THEN y0.y           -- clamp above range
         WHEN lo.x0 = hi.x1 THEN y0.y
         ELSE y0.y + (gr.tx - lo.x0) * (y1.y - y0.y) / (hi.x1 - lo.x0)
       END, 6) AS interp_y
FROM grid gr
LEFT JOIN lo ON gr.grp = lo.grp AND gr.tx = lo.tx
LEFT JOIN hi ON gr.grp = hi.grp AND gr.tx = hi.tx
LEFT JOIN pts y0 ON gr.grp = y0.grp AND lo.x0 = y0.x
LEFT JOIN pts y1 ON gr.grp = y1.grp AND hi.x1 = y1.x
"""


@register(
    "grouped_linear_interp",
    oracle=_INTERP_ORACLE,
    doc="§2.11 applyInPandas np.interp per group (protocol_data_warehouse.py:368-384) vs SQL piecewise-linear oracle",
)
def grouped_linear_interp(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    pts = li.groupBy(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("double").alias("x"),
    ).agg(F.avg("l_extendedprice").alias("y"))

    def interp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("x")
        out = pd.DataFrame(
            {
                "grp": pdf["grp"].iloc[0],
                "target_x": _TARGETS,
                "interp_y": np.round(
                    np.interp(np.array(_TARGETS), pdf["x"], pdf["y"]), 6
                ),
            }
        )
        return out

    return pts.groupBy("grp").applyInPandas(
        interp, schema="grp string, target_x double, interp_y double"
    )


# ---------------------------------------------------------------------------
# Orchestration: backfill a date range through the lake→warehouse→datamart
# asset graph (plans/orchestration.py + plans/events_pipeline.py), every
# layer written via TableStore dynamic partition overwrite, result read back
# from the store. Certifies the reference's partitioned-run entry point
# (aave_data/__init__.py:374-434) end-to-end against a plain-SQL oracle.
# ---------------------------------------------------------------------------
_ORCH_START, _ORCH_END = "2024-01-01", "2024-01-07"


@register(
    "orchestration_backfill_run",
    export=False,  # driver slot held by its family head (time_rollup_family)
    oracle=f"""
    WITH lake AS (
      SELECT CAST(ts AS DATE) AS day, user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             sum(value) AS total_value
      FROM events
      WHERE CAST(ts AS DATE) BETWEEN DATE '{_ORCH_START}' AND DATE '{_ORCH_END}'
      GROUP BY 1, 2
    ), wh AS (
      SELECT day,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_users,
             sum(total_value) AS total_value
      FROM lake GROUP BY day
    )
    SELECT CAST(day AS VARCHAR) AS day, n_events, n_users, total_value,
           total_value / lag(total_value) OVER (ORDER BY day) AS day_over_day
    FROM wh
    """,
    doc=(
        "partitioned-run orchestration: backfill 7 daily partitions through "
        "lake→warehouse→datamart via TableStore dynamic partition overwrite "
        "(ref aave_data/__init__.py:374-434), read the datamart table back"
    ),
)
def orchestration_backfill_run(spark, sf_dir):
    import os
    import tempfile

    from aave_etl_spark.io.table_store import TableStore
    from aave_etl_spark.plans.events_pipeline import events_pipeline_graph
    from aave_etl_spark.plans.orchestration import backfill

    # deterministic per-sf store root: repeat invocations (bench passes,
    # driver cert) OVERWRITE the same tables — bounded disk, and each
    # re-run additionally exercises the idempotent-overwrite path
    store_root = os.path.join(
        tempfile.gettempdir(),
        "aave_etl_spark_orch",
        os.path.basename(sf_dir.rstrip("/")),
    )
    store = TableStore(spark, store_root)
    graph = events_pipeline_graph()
    backfill(
        spark,
        store,
        graph,
        _ORCH_START,
        _ORCH_END,
        markets=(),
        resources={"events": t(spark, sf_dir, "events")},
    )
    return store.read("datamart_day_summary").select(
        F.col("day").cast("string").alias("day"),
        "n_events",
        "n_users",
        "total_value",
        "day_over_day",
    )


# ---------------------------------------------------------------------------
# K2 append-only end-to-end: the aave_token_liquidity_depth shape
# (protocol_data_lake.py:1904-2089 — non-idempotent append per fetch, the
# reference's append io manager aave_data/__init__.py:106-115) + the
# fetch_time-latest read (aave_dbt aave_token_liquidity_depth_latest.sql:16).
# Three deterministic sweep snapshots APPEND through TableStore (the table
# is reset first so re-runs stay bounded), then the latest-model SQL runs
# over the STORE read — certifying the append layout + max-fetch_time
# filter from at-rest data, not a fixture view.
# ---------------------------------------------------------------------------
_DEPTH_SNAPSHOT = """
SELECT TIMESTAMP '2024-06-0{idx} 00:00:00' AS fetch_time,
  'AAVE' AS from_asset, CAST(90 AS DOUBLE) + {idx} AS from_asset_price,
  CAST(g.g AS DOUBLE) * 100000 AS from_amount_usd,
  CAST(g.g AS DOUBLE) * 100000 / (CAST(90 AS DOUBLE) + {idx}) AS from_amount_native,
  'USDC' AS to_asset, CAST(1 AS DOUBLE) AS to_asset_price,
  CAST(g.g AS DOUBLE) * 100000 * (1 - CAST(g.g AS DOUBLE) * 0.002 * {idx}) AS to_amount_usd,
  CAST(g.g AS DOUBLE) * 100000 * (1 - CAST(g.g AS DOUBLE) * 0.002 * {idx}) AS to_amount_native,
  CAST(g.g AS DOUBLE) * 0.002 * {idx} AS price_impact
FROM (VALUES (1), (2), (3), (4), (5)) AS g(g)
"""

_DEPTH_LATEST_COLS = (
    "from_asset, from_asset_price, from_amount_native, from_amount_usd,"
    " to_asset, to_asset_price, to_amount_native, to_amount_usd, price_impact"
)


@register(
    "liquidity_depth_append_store",
    export=False,  # driver slot held by its family head (time_rollup_family)
    oracle=f"""
    WITH aave_token_liquidity_depth AS (
      {_DEPTH_SNAPSHOT.format(idx=1)}
      UNION ALL
      {_DEPTH_SNAPSHOT.format(idx=2)}
      UNION ALL
      {_DEPTH_SNAPSHOT.format(idx=3)}
    )
    SELECT {_DEPTH_LATEST_COLS}
    FROM aave_token_liquidity_depth
    WHERE fetch_time = (SELECT max(fetch_time) FROM aave_token_liquidity_depth)
    """,
    doc=(
        "K2 append-only end-to-end: three sweep snapshots appended through"
        " TableStore (reference append io manager), then the"
        " aave_token_liquidity_depth_latest model's max-fetch_time read"
        " runs over the STORE table"
    ),
)
def liquidity_depth_append_store(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from aave_etl_spark.datamart.models import MODELS
    from aave_etl_spark.io.table_store import TableStore

    store_root = os.path.join(
        tempfile.gettempdir(),
        "aave_etl_spark_depth",
        os.path.basename(sf_dir.rstrip("/")),
    )
    store = TableStore(spark, store_root)
    # reset so repeat invocations (bench passes, driver cert) exercise the
    # SAME three-append sequence with bounded disk
    shutil.rmtree(os.path.join(store_root, "aave_token_liquidity_depth"),
                  ignore_errors=True)
    for idx in (1, 2, 3):
        snap = spark.sql(_DEPTH_SNAPSHOT.format(idx=idx))
        store.write(snap, "aave_token_liquidity_depth", append_only=True)
    store.read("aave_token_liquidity_depth").createOrReplaceTempView(
        "aave_token_liquidity_depth"
    )
    # the dbt model SQL verbatim (fetch_time-latest filter,
    # aave_token_liquidity_depth_latest.sql:16)
    return spark.sql(MODELS["aave_token_liquidity_depth_latest"].sql)
