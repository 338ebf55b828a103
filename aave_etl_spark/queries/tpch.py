"""Relational-core queries over the TPC-H-ish tables.

Each query exercises SURVEY.md §2 operator rows (cited per query) re-homed
onto the driver's synthetic star schema. All builders are DataFrame-API
first so the Catalyst plan is fully declarative: filters/projections push to
the parquet scan, small dims broadcast, aggregates get map-side partials.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aave_etl_spark.queries.registry import register, t
from aave_etl_spark.localframe import local_df


# ---------------------------------------------------------------------------
# §2.4 group-by sums/avgs/counts + §2.2 predicate filters (data_warehouse.py
# groupby-sum pattern, helpers.py:239-248). TPC-H Q1 shape.
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                        AS sum_qty,
           sum(l_extendedprice)                                   AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount))                AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))  AS sum_charge,
           avg(l_quantity)                                        AS avg_qty,
           avg(l_extendedprice)                                   AS avg_price,
           avg(l_discount)                                        AS avg_disc,
           CAST(count(*) AS BIGINT)                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="§2.4 multi-key group-by sum/avg/count; §2.2 date predicate filter",
)
def pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc_price).alias("sum_disc_price"),
        F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        F.avg("l_quantity").alias("avg_qty"),
        F.avg("l_extendedprice").alias("avg_price"),
        F.avg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# §2.3 multi-way left/inner joins + broadcast dim joins (data_warehouse.py:109-128;
# all_financials.sql:442-445 4-way dim join). TPC-H Q5 shape.
# ---------------------------------------------------------------------------
@register(
    "revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    doc="§2.3 multi-key equi-joins, broadcast dim join (F.broadcast); §2.4 agg",
)
def revenue_by_nation(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 join + §2.4 agg + filter; TPC-H Q3 shape (join-enrichment models).
# ---------------------------------------------------------------------------
@register(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS l_orderkey,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
           o.o_orderdate AS o_orderdate,
           o.o_orderpriority AS o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-03-15'
      AND l.l_shipdate  > TIMESTAMP '1999-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
    doc="§2.3 inner joins; §2.2 predicate split; §2.4 multi-key agg",
)
def shipping_priority(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1999-03-15").cast("timestamp"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1999-03-15").cast("timestamp"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# §2.3 semi-join (isin pattern, data_lake.py:1029). TPC-H Q4 shape.
# ---------------------------------------------------------------------------
@register(
    "order_priority_semi",
    export=False,  # driver slot held by its family head (queries/families.py)
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    doc="§2.3 semi-join via left_semi (mints isin, data_lake.py:1029)",
)
def order_priority_semi(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# §2.3 anti-join (decoded_params_name.isna() filter pattern, data_lake.py:1030).
# ---------------------------------------------------------------------------
@register(
    "customers_without_orders",
    export=False,  # driver slot held by its family head (queries/families.py)
    oracle="""
    SELECT c.c_mktsegment AS c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           sum(c.c_acctbal) AS total_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
    doc="§2.3 anti-join (left_anti)",
)
def customers_without_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("c_acctbal").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# §2.2 range predicates → single global agg (TPC-H Q6; pushdown showcase:
# all three filters reach the parquet scan).
# ---------------------------------------------------------------------------
@register(
    "forecast_revenue",
    oracle="""
    SELECT sum(l_extendedprice * l_discount) AS revenue,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="§2.2 conjunctive predicates w/ pushdown; §2.4 global agg",
)
def forecast_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 conditional aggregation — the reference's in/out × internal/external
# transfer-quadrant sums (data_warehouse.py:171-179; Flipside CASE sums
# data_lake.py:1313-1356).
# ---------------------------------------------------------------------------
@register(
    "conditional_quadrant_sums",
    oracle="""
    SELECT l_linestatus,
           sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END) AS qty_returned,
           sum(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END) AS qty_accepted,
           sum(CASE WHEN l_returnflag = 'N' AND l_discount > 0.05 THEN l_extendedprice ELSE 0 END) AS hi_disc_price,
           sum(CASE WHEN l_returnflag = 'N' AND l_discount <= 0.05 THEN l_extendedprice ELSE 0 END) AS lo_disc_price
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc="§2.4 conditional agg F.sum(F.when) (transfer quadrant, data_warehouse.py:171-179)",
)
def conditional_quadrant_sums(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(0.0)).alias("qty_returned"),
        F.sum(F.when(F.col("l_returnflag") == "A", F.col("l_quantity")).otherwise(0.0)).alias("qty_accepted"),
        F.sum(
            F.when((F.col("l_returnflag") == "N") & (F.col("l_discount") > 0.05), F.col("l_extendedprice")).otherwise(0.0)
        ).alias("hi_disc_price"),
        F.sum(
            F.when((F.col("l_returnflag") == "N") & (F.col("l_discount") <= 0.05), F.col("l_extendedprice")).otherwise(0.0)
        ).alias("lo_disc_price"),
    )


# ---------------------------------------------------------------------------
# §2.9 math (safe_div, protocol_data_warehouse.py:196-198) + §2.4 ratio-of-
# sums (inv_defi_ref_rates_by_day.sql:6-7) + year extraction.
# ---------------------------------------------------------------------------
@register(
    "market_share_ratio",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           CASE WHEN sum(l.l_extendedprice * (1 - l.l_discount)) <> 0
                THEN sum(CASE WHEN n.n_name = 'UNITED STATES'
                              THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                     / sum(l.l_extendedprice * (1 - l.l_discount))
                ELSE 0 END AS us_share,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS total_revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY year(o.o_orderdate)
    """,
    doc="§2.9 safe_div guard; §2.4 conditional agg ratio; date part extraction",
)
def market_share_ratio(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = joined.groupBy(F.year("o_orderdate").cast("long").alias("order_year")).agg(
        F.sum(F.when(F.col("n_name") == "UNITED STATES", rev).otherwise(0.0)).alias("_us"),
        F.sum(rev).alias("total_revenue"),
    )
    return agg.select(
        "order_year",
        F.when(F.col("total_revenue") != 0, F.col("_us") / F.col("total_revenue")).otherwise(0.0).alias("us_share"),
        "total_revenue",
    )


# ---------------------------------------------------------------------------
# §2.4 min-rank pick / argmin per group (token_prices price-rank dedup,
# data_warehouse.py:510-518).
# ---------------------------------------------------------------------------
@register(
    "cheapest_part_per_type",
    oracle="""
    SELECT p_type, p_partkey, p_name, p_retailprice
    FROM part
    QUALIFY row_number() OVER (PARTITION BY p_type ORDER BY p_retailprice, p_partkey) = 1
    """,
    doc="§2.4 min-rank pick (argmin per group; price-rank dedup data_warehouse.py:510-518)",
)
def cheapest_part_per_type(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_type").orderBy("p_retailprice", "p_partkey")
    return (
        p.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# §2.7 UNION ALL with literal-0 padding (all_financials.sql:35-58) and
# §2.7 UNION DISTINCT (market_config_by_time.sql:67-69).
# ---------------------------------------------------------------------------
@register(
    "union_all_padded",
    export=False,  # driver slot held by its family head (queries/families.py)
    oracle="""
    SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
           'order_value' AS measure,
           sum(o_totalprice) AS value,
           CAST(0.0 AS DOUBLE) AS fee
    FROM orders GROUP BY date_trunc('day', o_orderdate)
    UNION ALL
    SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day,
           'ship_fee' AS measure,
           CAST(0.0 AS DOUBLE) AS value,
           sum(l_extendedprice * l_tax) AS fee
    FROM lineitem GROUP BY date_trunc('day', l_shipdate)
    """,
    doc="§2.7 UNION ALL schema-aligned stacking with lit-0 pads (all_financials.sql:35-58)",
)
def union_all_padded(spark, sf_dir):
    o = (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("DAY", F.col("o_orderdate")).alias("day"))
        .agg(F.sum("o_totalprice").alias("value"))
        .select("day", F.lit("order_value").alias("measure"), "value", F.lit(0.0).alias("fee"))
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("DAY", F.col("l_shipdate")).alias("day"))
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_tax")).alias("fee"))
        .select("day", F.lit("ship_fee").alias("measure"), F.lit(0.0).alias("value"), "fee")
    )
    return o.unionByName(li)


@register(
    "union_distinct_keys",
    export=False,  # driver slot held by its family head (queries/families.py)
    oracle="""
    SELECT DISTINCT * FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
    doc="§2.7 UNION DISTINCT via distinct-over-union-all (market_config_by_time.sql:67-69)",
)
def union_distinct_keys(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


# ---------------------------------------------------------------------------
# §2.8 UNPIVOT 37-col wide→long (all_financials.sql:419-424) via stack/melt.
# ---------------------------------------------------------------------------
@register(
    "unpivot_measures",
    export=False,  # driver slot held by its family head (queries/families.py)
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             sum(l_quantity)      AS sum_qty,
             sum(l_extendedprice) AS sum_price,
             avg(l_discount)      AS avg_disc,
             avg(l_tax)           AS avg_tax
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
    UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM wide
    UNION ALL SELECT l_returnflag, 'avg_disc',  avg_disc  FROM wide
    UNION ALL SELECT l_returnflag, 'avg_tax',   avg_tax   FROM wide
    """,
    doc="§2.8 UNPIVOT wide→(measure,value) long (all_financials.sql:419-424) via melt",
)
def unpivot_measures(spark, sf_dir):
    wide = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.avg("l_tax").alias("avg_tax"),
        )
    )
    return wide.melt(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "avg_disc", "avg_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# §2.8 PIVOT with agg (streaming_payments_summary.sql:58-66).
# ---------------------------------------------------------------------------
@register(
    "pivot_status_by_priority",
    export=False,  # driver slot held by its family head (queries/families.py)
    oracle="""
    SELECT o_orderpriority,
           sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END) AS f_total,
           sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END) AS o_total,
           sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END) AS p_total
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="§2.8 PIVOT groupBy().pivot().agg (streaming_payments_summary.sql:58-66)",
)
def pivot_status_by_priority(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("f_total"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("o_total"),
        F.coalesce(F.col("P"), F.lit(0.0)).alias("p_total"),
    )


# ---------------------------------------------------------------------------
# §2.3 cross join (bad-debt sweep grid, protocol_data_warehouse.py:560) +
# left join + coalesce-0 fill (§2.2 null handling).
# ---------------------------------------------------------------------------
@register(
    "grid_fill_region_status",
    oracle="""
    WITH grid AS (
      SELECT r.r_name AS r_name, s.o_orderstatus AS o_orderstatus
      FROM (SELECT DISTINCT r_name FROM region) r
      CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    ),
    actual AS (
      SELECT r.r_name AS r_name, o.o_orderstatus AS o_orderstatus,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, o.o_orderstatus
    )
    SELECT g.r_name, g.o_orderstatus,
           COALESCE(a.n_orders, 0) AS n_orders
    FROM grid g LEFT JOIN actual a
      ON g.r_name = a.r_name AND g.o_orderstatus = a.o_orderstatus
    """,
    doc="§2.3 cross-join grid (protocol_data_warehouse.py:560); left join + coalesce fill",
)
def grid_fill_region_status(spark, sf_dir):
    r = t(spark, sf_dir, "region").select("r_name").distinct()
    s = t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    grid = r.crossJoin(s)
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    actual = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(reg), n.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return grid.join(actual, ["r_name", "o_orderstatus"], "left").select(
        "r_name", "o_orderstatus", F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders")
    )


# ---------------------------------------------------------------------------
# §2.4/§2.6 scalar-subquery "latest" filter (treasury_totals_latest.sql:9;
# aave_atokens.sql:24).
# ---------------------------------------------------------------------------
@register(
    "latest_day_snapshot",
    oracle="""
    SELECT l_returnflag,
           sum(l_extendedprice) AS latest_price_total,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate = (SELECT max(l_shipdate) FROM lineitem)
    GROUP BY l_returnflag
    """,
    doc="§2.4 scalar subquery max() latest-partition filter (treasury_totals_latest.sql:9)",
)
def latest_day_snapshot(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               sum(l_extendedprice) AS latest_price_total,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate = (SELECT max(l_shipdate) FROM lineitem)
        GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# §2.8 grid generation via sequence + explode (sweep ranges,
# protocol_data_lake.py:893-896, 995-996: np.linspace → F.sequence+transform).
# ---------------------------------------------------------------------------
@register(
    "explode_linspace_grid",
    oracle="""
    SELECT r.r_name AS r_name,
           CAST(u.i AS BIGINT) AS step,
           1000.0 + CAST(u.i AS DOUBLE) * (10000.0 - 1000.0) / 19 AS sweep_amount
    FROM region r
    CROSS JOIN (SELECT unnest(range(0, 20)) AS i) u
    """,
    doc="§2.8 linspace grid gen: explode(sequence) + transform (protocol_data_lake.py:995-996)",
)
def explode_linspace_grid(spark, sf_dir):
    r = t(spark, sf_dir, "region")
    return r.select(
        "r_name", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("step")
    ).select(
        "r_name",
        F.col("step").cast("long").alias("step"),
        (F.lit(1000.0) + F.col("step").cast("double") * (10000.0 - 1000.0) / 19).alias("sweep_amount"),
    )


# ---------------------------------------------------------------------------
# §2.9 string functions (concat ||, lower, replace, right/substr —
# all_treasury_balances.sql:17, inv_defi_ref_stable_rate_base.sql:55).
# ---------------------------------------------------------------------------
@register(
    "string_shaping",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lc,
           replace(p_type, 'PLATED', 'COATED') AS type_fixed,
           p_brand || '_' || CAST(p_size AS VARCHAR) AS brand_size,
           right(p_type, 4) AS type_suffix,
           CASE WHEN p_name LIKE '0x%' THEN lower(p_name) ELSE p_name END AS addr_canon
    FROM part
    """,
    doc="§2.9 string fns: concat ||, lower, replace, right; 0x-lowercase canon (helpers.py:690-691)",
)
def string_shaping(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.regexp_replace("p_type", "PLATED", "COATED").alias("type_fixed"),
        F.concat_ws("_", F.col("p_brand"), F.col("p_size").cast("string")).alias("brand_size"),
        F.substring(F.col("p_type"), -4, 4).alias("type_suffix"),
        F.when(F.col("p_name").startswith("0x"), F.lower("p_name")).otherwise(F.col("p_name")).alias("addr_canon"),
    )


# ---------------------------------------------------------------------------
# §2.3 positional join by row order (RPC array results re-joined by position,
# data_lake.py:2073, 2189; helpers.py:1448) → rank-to-rank join.
# ---------------------------------------------------------------------------
@register(
    "positional_rank_join",
    oracle="""
    WITH f AS (
      SELECT o_orderkey AS f_orderkey, o_totalprice AS f_price,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders WHERE o_orderstatus = 'F'
    ),
    o AS (
      SELECT o_orderkey AS o_orderkey, o_totalprice AS o_price,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT f.rn AS rn, f.f_orderkey, f.f_price, o.o_orderkey, o.o_price
    FROM f JOIN o ON f.rn = o.rn
    WHERE f.rn <= 100
    """,
    doc="§2.3 positional join via row_number rank-to-rank (data_lake.py:2073)",
)
def positional_rank_join(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    wf = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    f = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(
            F.col("o_orderkey").alias("f_orderkey"),
            F.col("o_totalprice").alias("f_price"),
            F.row_number().over(wf).alias("rn"),
        )
    )
    o = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(
            F.col("o_orderkey").alias("o_orderkey"),
            F.col("o_totalprice").alias("o_price"),
            F.row_number().over(wf).alias("rn"),
        )
    )
    return (
        f.join(o, "rn")
        .filter(F.col("rn") <= 100)
        .select("rn", "f_orderkey", "f_price", "o_orderkey", "o_price")
    )


# ---------------------------------------------------------------------------
# §2.9 APY compounding math pow(1+r/n,n)-1 (market_state_by_hour.sql:22-25,
# protocol_data_warehouse.py:120-122) + round().
# ---------------------------------------------------------------------------
@register(
    "apy_compounding",
    export=False,  # driver slot held by its family head (queries/families.py)
    oracle="""
    SELECT l_returnflag,
           avg(pow(1 + l_discount / 365, 365) - 1) AS avg_apy,
           round(avg(pow(1 + l_discount / 365, 365) - 1), 5) AS avg_apy_rounded
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="§2.9 APY pow-compounding (market_state_by_hour.sql:22-25); round(x,5) (impact_proposal_87.sql:53)",
)
def apy_compounding(spark, sf_dir):
    from aave_etl_spark.functions.scalars import apy_from_rate

    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(F.avg(apy_from_rate(F.col("l_discount"), 365)).alias("avg_apy"))
    return agg.select("l_returnflag", "avg_apy", F.round("avg_apy", 5).alias("avg_apy_rounded"))


# ---------------------------------------------------------------------------
# §2.3 broadcast dim join explicitly (tiny market→chain lookup pattern,
# data_warehouse.py:109-112).
# ---------------------------------------------------------------------------
@register(
    "broadcast_dim_enrich",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           sum(s.s_acctbal) AS total_acctbal,
           CAST(count(*) AS BIGINT) AS n_suppliers
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    doc="§2.3 broadcast-style dim join (market→chain lookup, data_warehouse.py:109-119)",
)
def broadcast_dim_enrich(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.sum("s_acctbal").alias("total_acctbal"), F.count(F.lit(1)).alias("n_suppliers"))
    )


# ---------------------------------------------------------------------------
# Skew-salted join: lineitem keyed down to TWO hot values (extreme skew —
# each key ~50% of the table) joined to a tiny dim through
# operators/skew.salted_join, which spreads each hot key over n salt
# partitions. The result is identical to the plain join (the oracle IS the
# plain join), certifying that salting never changes semantics.
# ---------------------------------------------------------------------------
@register(
    "salted_hot_join",
    export=False,  # driver slot held by its family head (queries/families.py)
    oracle="""
    WITH big AS (
      SELECT l_orderkey % 2 AS hot_key, l_quantity FROM lineitem
    ),
    dim AS (
      SELECT CAST(0 AS BIGINT) AS hot_key, 'even' AS label
      UNION ALL SELECT 1, 'odd'
    )
    SELECT d.label, sum(b.l_quantity) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM big b JOIN dim d USING (hot_key)
    GROUP BY d.label
    """,
    doc=(
        "skew-salted join (operators/skew.py): 2-hot-key big side spread over"
        " salt partitions, replicated dim; result identical to the plain join"
    ),
)
def salted_hot_join(spark, sf_dir):
    from aave_etl_spark.operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select(
        F.pmod(F.col("l_orderkey"), F.lit(2)).cast("long").alias("hot_key"),
        "l_quantity",
    )
    dim = local_df(spark, [(0, "even"), (1, "odd")], "hot_key long, label string")
    joined = salted_join(li, dim, ["hot_key"], n_salts=8)
    return joined.groupBy("label").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Range (interval-containment) join: lineitem quantities against tier
# intervals via operators/range_join.py — bucketized equi-join + exact
# post-filter, never a nested-loop range probe. Oracle is the plain
# BETWEEN join: identical results certify the bucketization.
# ---------------------------------------------------------------------------
@register(
    "quantity_tier_range_join",
    export=False,  # driver slot held by its family head (queries/families.py)
    oracle="""
    WITH tiers(tier, lo, hi) AS (
      VALUES ('bronze', 1.0, 10.0), ('silver', 11.0, 25.0),
             ('gold', 26.0, 40.0), ('platinum', 41.0, 50.0)
    )
    SELECT t.tier, CAST(count(*) AS BIGINT) AS n_rows,
           sum(CAST(l.l_quantity AS DOUBLE)) AS sum_qty
    FROM lineitem l JOIN tiers t
      ON CAST(l.l_quantity AS DOUBLE) BETWEEN t.lo AND t.hi
    GROUP BY t.tier
    """,
    doc=(
        "range join (operators/range_join.py): bucketized interval join of"
        " quantities to tier ranges; plain-BETWEEN oracle certifies identity"
    ),
)
def quantity_tier_range_join(spark, sf_dir):
    from aave_etl_spark.operators.range_join import range_join

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("qty")
    )
    tiers = local_df(spark, 
        [("bronze", 1.0, 10.0), ("silver", 11.0, 25.0),
         ("gold", 26.0, 40.0), ("platinum", 41.0, 50.0)],
        "tier string, lo double, hi double",
    )
    joined = range_join(li, tiers, "qty", bucket_width=10.0)
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("qty").alias("sum_qty")
    )
