"""Relational query catalog (scans, filters, joins, aggs, windows, sorts,
set ops, scalar functions) over the driver testdata star schema.

The reference runtime has no relational operators (SURVEY.md §2) — its
joins are N-ary synchronization joins (`/root/reference/src/task/hc/
hc-task.c:261-269`), its aggregations user-space tree reductions
(`examples/treesum_2level/treesum_2level.c`). Each query here is the
declarative Spark re-expression of one rubric category, written so
Catalyst gets pushdown/pruning/broadcast for free.

Parity rules for the DuckDB oracle (driver compares value hashes):
  - alias every computed column identically on both sides;
  - round every floating aggregate (engines sum doubles in different
    orders; rounding at 2-6 decimals absorbs the ulp drift);
  - emit timestamps as formatted strings or dates (Spark is session-TZ
    aware, DuckDB naive);
  - deterministic ORDER BY is irrelevant to the hash (order-insensitive)
    but LIMIT queries must tie-break deterministically on a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ocr_spark.plans import register
from ocr_spark.sources.io import load_table


# --- scans / filters / projections -----------------------------------------


@register(
    "q02_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_quantity < 24
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection; filters must reach the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") < 24)
        ).select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        )
    )


# --- aggregations -----------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                       AS sum_qty,
           round(sum(l_extendedprice), 2)                                  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                       AS avg_qty,
           round(avg(l_extendedprice), 4)                                  AS avg_price,
           round(avg(l_discount), 6)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate groupBy; Spark's partial+final
    agg is the built-in version of the reference's treesum reduction."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q06_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: full-scan single aggregate, no shuffle beyond the
    final single-partition combine."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "q13_distinct_agg",
    oracle="""
    SELECT o_orderpriority,
           count(*)                   AS n_orders,
           count(DISTINCT o_custkey)  AS n_customers,
           round(avg(o_totalprice),4) AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q13_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@register(
    "q14_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 2)     AS sum_qty,
           count(*)                      AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q14_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate (rollup); the reference's nested finish-EDT
    scopes (`src/task/hc/hc-task.c:169-215`) are the same roll-up shape."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "q17_conditional_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_open,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_filled,
           round(sum(CASE WHEN l_linestatus NOT IN ('O','F') THEN l_quantity ELSE 0 END), 2) AS qty_other
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q17_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    ls = F.col("l_linestatus")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.when(ls == "O", qty).otherwise(0)), 2).alias("qty_open"),
        F.round(F.sum(F.when(ls == "F", qty).otherwise(0)), 2).alias("qty_filled"),
        F.round(F.sum(F.when(~ls.isin("O", "F"), qty).otherwise(0)), 2).alias("qty_other"),
    )


@register(
    "q18_stats_agg",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 2) AS sd_price,
           round(var_samp(l_discount), 6)         AS var_disc,
           round(corr(l_extendedprice, l_quantity), 4) AS corr_pq,
           round(min(l_extendedprice), 2)         AS min_price,
           round(max(l_extendedprice), 2)         AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q18_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_pq"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


# --- joins ------------------------------------------------------------------


@register(
    "q03_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey ASC LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-k. Customer is dimension-
    sized — broadcast it so only the orders↔lineitem join shuffles."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(li.l_orderkey.alias("orderkey"), F.col("o_orderdate"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


@register(
    "q05_region_revenue",
    oracle="""
    SELECT r.r_name AS region,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY r.r_name
    """,
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake join: every dimension (customer/nation/region) broadcast,
    so the only shuffle is the fact-fact join + final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1996-01-01")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dims = F.broadcast(
        c.join(n, c.c_nationkey == n.n_nationkey).join(r, n.n_regionkey == r.r_regionkey)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q12_semi_anti_join",
    oracle="""
    SELECT
      (SELECT count(*) FROM customer c WHERE EXISTS
         (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with_orders,
      (SELECT count(*) FROM customer c WHERE NOT EXISTS
         (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without_orders
    """,
)
def q12_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS as left_semi / left_anti — the same pattern the
    restart protocol uses against the commit-marker table."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # one plan, one job: a single left join against distinct orderer keys
    # marks each customer, then both counts fall out of one aggregate —
    # round 1 ran two separate .count() actions + a createDataFrame
    mark = (
        o.select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("has_order", F.lit(1))
    )
    return (
        c.select("c_custkey")
        .join(mark, "c_custkey", "left")
        .agg(
            F.count(F.col("has_order")).alias("n_with_orders"),
            F.count(F.when(F.col("has_order").isNull(), 1)).alias("n_without_orders"),
        )
    )


# --- window functions -------------------------------------------------------


@register(
    "q07_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q07_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rn")
    )


@register(
    "q08_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS seq
    FROM orders
    """,
)
def q08_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2).alias(
            "running_total"
        ),
        F.row_number().over(w).alias("seq"),
    )


@register(
    "q09_sessionize",
    oracle="""
    SELECT user_id, count(DISTINCT session_id) AS n_sessions, count(*) AS n_events
    FROM (
      SELECT user_id,
             sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_s
        FROM events
      )
    ) GROUP BY user_id
    """,
)
def q09_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + cumulative gap counter — the batch twin of
    streaming session_window (ocr_spark.streaming has that variant)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet carries TIMESTAMP_NTZ: go via timestamp (session TZ = UTC) to epoch
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    sess = F.sum(F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id")
        .agg(F.countDistinct("session_id").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


# --- sorts / limits ----------------------------------------------------------


@register(
    "q10_top_orders",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def q10_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark's TakeOrderedAndProject — per-partition heap +
    driver merge, never a full sort at scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


# --- set operations ----------------------------------------------------------


@register(
    "q11_set_ops",
    oracle="""
    SELECT 'only_building' AS tag, count(*) AS n FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT o_custkey AS c_custkey FROM orders
    )
    UNION ALL
    SELECT 'intersect' AS tag, count(*) AS n FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey AS c_custkey FROM orders
    )
    UNION ALL
    SELECT 'union_all_rows' AS tag, count(*) AS n FROM (
      SELECT c_custkey FROM customer
      UNION ALL
      SELECT o_custkey AS c_custkey FROM orders
    )
    """,
)
def q11_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ordered = o.select(F.col("o_custkey").alias("c_custkey"))

    # one plan: union of the three aggregate subplans (round 1 drove
    # three .count() actions and rebuilt a local DataFrame)
    def tagged(tag: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(tag).alias("tag"), "n"
        )

    return (
        tagged("only_building", building.exceptAll(ordered.distinct()).distinct())
        .unionByName(tagged("intersect", building.intersect(ordered)))
        .unionByName(tagged("union_all_rows", c.select("c_custkey").unionAll(ordered)))
    )


# --- scalar functions ---------------------------------------------------------


@register(
    "q15_scalar_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                            AS brand_u,
           substr(p_name, 1, 8)                      AS name8,
           length(p_name)                            AS name_len,
           concat(p_type, '/', p_brand)              AS type_brand,
           round(abs(p_retailprice - 1000.0), 2)     AS dist1000,
           CAST(floor(p_retailprice / 100) AS BIGINT) AS price_bucket,
           p_size % 7                                AS size_mod
    FROM part WHERE p_size >= 10
    """,
)
def q15_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 10)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
        F.round(F.abs(F.col("p_retailprice") - 1000.0), 2).alias("dist1000"),
        F.floor(F.col("p_retailprice") / 100).cast("long").alias("price_bucket"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


@register(
    "q16_date_json_funcs",
    oracle="""
    SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
           CAST(day(ts) AS INT) AS d, event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k
    FROM events GROUP BY 1, 2, 3, 4
    """,
)
def q16_date_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            "event_type",
            "value",
            F.get_json_object("props", "$.k").cast("double").alias("k"),
        )
        .groupBy("y", "m", "d", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


@register(
    "q19_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q19_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming tumbling-window aggregation
    (ocr_spark.streaming.ingest runs the same plan via readStream)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register("q21_approx_sketches")  # rows-only: sketch algorithms differ per engine
def q21_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL + quantile sketches — the constant-memory path for distinct
    counts / percentiles at 100 TB (exact variants shuffle all values).
    Quantiles are emitted as scalar columns (not an array) so the
    driver's row canonicalizer can hash them."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_price"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("p95_price"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("p99_price"),
    )


@register(
    "q22_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q22_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "total",
        )
    )


@register(
    "q20_asof_join",
    oracle="""
    SELECT e.user_id, e.event_id, strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(v.view_ts, '%Y-%m-%d %H:%M:%S') AS last_view_ts
    FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') e
    ASOF LEFT JOIN (SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view') v
      ON e.user_id = v.user_id AND e.ts >= v.view_ts
    """,
)
def q20_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark lacks a native one): union-tag the two streams,
    one window pass per user carries the last view forward — no join, one
    shuffle on user_id. Scales as a single exchange at any size."""
    e = load_table(spark, sf_dir, "events")
    tagged = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "view", F.col("ts")).alias("view_ts_or_null"),
    )
    # Order views before clicks at identical ts so `ts >= view_ts` includes ties.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.when(F.col("event_type") == "view", 0).otherwise(1), "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.withColumn("last_view_ts", F.last("view_ts_or_null", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.date_format("last_view_ts", "yyyy-MM-dd HH:mm:ss").alias("last_view_ts"),
        )
    )


@register(
    "q23_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5)  AS p50_price_cents,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.9)  AS p90_price_cents,
           quantile_cont(CAST(round(l_quantity * 100) AS BIGINT), 0.25)      AS p25_qty_cents,
           quantile_cont(CAST(round(l_quantity * 100) AS BIGINT), 0.75)      AS p75_qty_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q23_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (sort-based agg). Spark's
    `percentile` and DuckDB's `quantile_cont` share the type-7
    lower + (upper-lower)*frac definition, so over INTEGER inputs
    (cents) the interpolated double is the identical IEEE expression in
    both engines — no rounding, which at .xx5 midpoints diverges
    between Spark's HALF_UP and DuckDB's half-away. The approx path
    (q21 sketches) is the 100 TB variant; this is the exact verifier at
    golden scale."""
    li = load_table(spark, sf_dir, "lineitem")
    price_c = "cast(round(l_extendedprice * 100) as long)"
    qty_c = "cast(round(l_quantity * 100) as long)"
    return li.groupBy("l_returnflag").agg(
        F.expr(f"percentile({price_c}, 0.5)").alias("p50_price_cents"),
        F.expr(f"percentile({price_c}, 0.9)").alias("p90_price_cents"),
        F.expr(f"percentile({qty_c}, 0.25)").alias("p25_qty_cents"),
        F.expr(f"percentile({qty_c}, 0.75)").alias("p75_qty_cents"),
    )


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join + agg
    (testdata lineitem has no commit/receipt dates, so "late" becomes
    "has a returned line"). The semi join shuffles only orderkeys of
    matching lineitems, never the full lineitem rows."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        o.filter(
            (F.col("o_orderdate") >= "1996-07-01")
            & (F.col("o_orderdate") < "1996-10-01")
        )
        .join(late, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q24_correlated_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice,
           CAST(round(o.o_totalprice * 100) AS BIGINT)
             - (SELECT CAST(sum(CAST(round(o2.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       / count(*)
                FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS vs_cust_avg_cents
    FROM orders o
    WHERE CAST(round(o.o_totalprice * 100) AS BIGINT)
          > 2 * (SELECT CAST(sum(CAST(round(o3.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                        / count(*)
                 FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
    """,
)
def q24_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries — Catalyst decorrelates both into
    aggregate-join form (one shuffle on o_custkey), the rewrite the
    reference has no analogue for (SURVEY §4.2).

    Cross-engine hash parity uses the q23 technique: the per-customer
    average is computed as sum(integer cents) / count on both engines,
    so the division is the identical IEEE double expression — no
    round() of an engine-order-dependent double sum (round 1's q24
    hash mismatch)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT o.o_orderkey, o.o_totalprice,
               CAST(round(o.o_totalprice * 100) AS BIGINT)
                 - (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
                           / count(*)
                    FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey) AS vs_cust_avg_cents
        FROM orders_v o
        WHERE CAST(round(o.o_totalprice * 100) AS BIGINT)
              > 2 * (SELECT sum(CAST(round(o3.o_totalprice * 100) AS BIGINT))
                            / count(*)
                     FROM orders_v o3 WHERE o3.o_custkey = o.o_custkey)
    """)


@register(
    "q25_range_frame",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2)
             AS rolling_1h_value
    FROM (SELECT event_id, user_id, value, ts FROM events WHERE value IS NOT NULL)
    """,
)
def q25_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame over event-time seconds (value-based frame, not
    row-count): per-user rolling 1-hour sum — the frame spec family q08's
    rowsBetween does not cover."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("rolling_1h_value"),
    )


@register(
    "q27_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
    ), spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day, et.event_type
      FROM bounds, (SELECT DISTINCT event_type FROM events) et
    ), daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day, s.event_type,
           coalesce(d.n, 0) AS n
    FROM spine s LEFT JOIN daily d ON d.day = s.day AND d.event_type = s.event_type
    """,
)
def q27_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: dense (day x event_type) spine via
    sequence+explode cross-joined with the distinct dimension, left-join
    the sparse daily aggregate, zero-fill. The spine side is generated,
    never scanned — at any scale the only shuffle is the daily groupBy."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("timestamp").cast("date")
    )
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    ).crossJoin(ev.select("event_type").distinct())
    daily = ev.groupBy("day", "event_type").agg(F.count(F.lit(1)).alias("n_raw"))
    return (
        spine.join(daily, ["day", "event_type"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce("n_raw", F.lit(0)).alias("n"),
        )
    )


@register(
    "q28_range_join",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, epoch(ts) AS cts FROM events WHERE event_type = 'click'
    ), views AS (
      SELECT user_id, epoch(ts) AS vts FROM events WHERE event_type = 'view'
    )
    SELECT c.user_id, c.event_id,
           CAST(count(v.vts) AS BIGINT) AS n_views_1h
    FROM clicks c LEFT JOIN views v
      ON v.user_id = c.user_id AND v.vts >= c.cts - 3600 AND v.vts < c.cts
    GROUP BY c.user_id, c.event_id
    """,
)
def q28_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: views within the hour before each click,
    executed as a BANDED join — each click probes exactly the two hour
    buckets its window can span, each view lands in one bucket, so the
    join is equi on (user_id, hour_bucket) with the exact range check as
    a residual filter. A naive equality-only join on user_id would pair
    every click with every view of that user (quadratic for whale
    users); banding bounds the per-task pair count by the bucket width
    regardless of key skew — the time-domain analogue of d03's LSH
    banding, and the shape a 100 TB point-in-interval join needs.
    """
    e = load_table(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", epoch.alias("cts")
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", epoch.alias("vts")
    )
    # window (cts-3600, cts] spans exactly buckets hb-1 and hb
    c_b = clicks.select(
        "user_id",
        "event_id",
        "cts",
        F.explode(
            F.array(
                (F.floor(F.col("cts") / 3600) - 1).alias("a"),
                F.floor(F.col("cts") / 3600),
            )
        ).alias("hb"),
    )
    v_b = views.select("user_id", "vts", F.floor(F.col("vts") / 3600).alias("hb"))
    matched = (
        c_b.join(v_b, ["user_id", "hb"])
        .filter((F.col("vts") >= F.col("cts") - 3600) & (F.col("vts") < F.col("cts")))
        .groupBy("user_id", "event_id")
        .agg(F.count(F.lit(1)).alias("n_views_1h"))
    )
    return (
        clicks.join(matched, ["user_id", "event_id"], "left")
        .select(
            "user_id",
            "event_id",
            F.coalesce("n_views_1h", F.lit(0)).alias("n_views_1h"),
        )
    )


@register(
    "q30_full_outer",
    oracle="""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           CAST(c.c_custkey IS NOT NULL AS BOOLEAN) AS has_customer,
           CAST(o.n_orders IS NOT NULL AS BOOLEAN) AS has_orders,
           coalesce(o.n_orders, 0) AS n_orders
    FROM customer c
    FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
                     FROM orders GROUP BY o_custkey) o
      ON o.o_custkey = c.c_custkey
    """,
)
def q30_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — the reconciliation shape (rows on either side
    only are both preserved). Aggregating the fact side BEFORE the join
    keeps the outer join's input one row per key — at scale a full outer
    of raw fact rows multiplies nulls; of pre-agged keys it is a 1:1
    merge."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_custkey").isNotNull().alias("has_customer"),
        F.col("n_orders").isNotNull().alias("has_orders"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


@register(
    "q31_latest_per_key",
    oracle="""
    SELECT user_id, event_id AS latest_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS latest_ts, event_type
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q31_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key (CDC upsert compaction): one window pass, the
    canonical way to materialize current state from an append log. At
    scale this is a single shuffle on the key; AQE handles hot keys, and
    on a sorted/bucketed table it degrades to a near-free mapSideCombine
    shape."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
            "event_type",
        )
    )


@register(
    "q32_rank_family",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 9) AS pr,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                          o_orderkey ASC)
    """,
)
def q32_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window family (ntile / percent_rank / rank / dense_rank)
    with integer-cents ordering so rank boundaries are bit-identical
    across engines; percent_rank's (rank-1)/(n-1) division is the same
    IEEE expression on identical integer ranks."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(
        F.expr("cast(round(o_totalprice * 100) as long)").desc(),
        F.col("o_orderkey").asc(),
    )
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "q33_multiset_ops",
    oracle="""
    SELECT 'except_all' AS tag, count(*) AS n FROM (
      SELECT o_custkey FROM orders
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    UNION ALL
    SELECT 'intersect_all' AS tag, count(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def q33_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — EXCEPT ALL / INTERSECT ALL keep
    duplicate multiplicities (q11 covers the DISTINCT variants); Spark
    plans both as a count-differencing aggregate, one shuffle each."""
    o = load_table(spark, sf_dir, "orders")
    all_keys = o.select("o_custkey")
    f_keys = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")

    def tagged(tag: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(tag).alias("tag"), "n"
        )

    return tagged("except_all", all_keys.exceptAll(f_keys)).unionByName(
        tagged("intersect_all", o_keys.intersectAll(f_keys))
    )
