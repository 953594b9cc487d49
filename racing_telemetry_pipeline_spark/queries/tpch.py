"""Relational coverage: TPC-H-style scan/filter/join/agg/sort/limit queries.

These cover the generic OLAP surface (SURVEY.md §2.1 scans, §2.4 joins,
§2.5 aggregations, §2.7 sort/limit) on the star-schema testdata. Money
sums go through exact decimal casts (order-independent; 2-4 decimal
source values make the casts boundary-safe).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import t, t_fanout

_DEC = "decimal(24,6)"


def _disc_price():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)


# --- Q1: pricing summary (grouped multi-agg) --------------------------------
def q1_pricing_summary(spark, sf_dir):
    # q1 is a pure partial-agg scan: all its work happens BEFORE the first
    # exchange, so a single-row-group bench file serializes it (common.py
    # t_fanout note) — the fan-out parallelizes the decimal partial sums
    li = t_fanout(spark, sf_dir, "lineitem")
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast(_DEC)
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(_DEC)).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(_disc_price()).cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 2).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  round(cast(sum(cast(l_quantity as decimal(24,6))) as double), 2) AS sum_qty,
  round(cast(sum(cast(l_extendedprice as decimal(24,6))) as double), 2) AS sum_base_price,
  round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(24,6))) as double), 2) AS sum_disc_price,
  round(cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) as decimal(24,6))) as double), 2) AS sum_charge,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= timestamp '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3: shipping priority (3-way join + top-N) ------------------------------
def q3_top_orders(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_disc_price()).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(24,6))) as double), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < timestamp '1998-01-01'
  AND l_shipdate > timestamp '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- Q5: local supplier volume (6-way join, partition-pruned dims) -----------
def q5_region_revenue(spark, sf_dir):
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(dims, F.col("s_nationkey") == dims.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_disc_price()).cast("double"), 2).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
       round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(24,6))) as double), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
  AND o_orderdate >= timestamp '1996-01-01' AND o_orderdate < timestamp '1998-01-01'
GROUP BY n_name
"""


# --- top-K per group (ranking window; best-lap analog) ------------------------
# ref: best-lap selection /root/reference/src/schemas/features.py:81-130
def o1_topk_orders_per_priority(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_priority", F.row_number().over(w))
        .filter(F.col("rank_in_priority") <= 3)
        .select("o_orderpriority", "rank_in_priority", "o_orderkey", "o_totalprice")
    )


O1_SQL = """
SELECT o_orderpriority, rank_in_priority, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_priority
  FROM orders
)
WHERE rank_in_priority <= 3
"""


# --- anti/semi join (exists-style routing) ------------------------------------
def j3_customers_without_orders(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast(_DEC)).cast("double"), 2).alias(
                "sum_acctbal"
            ),
        )
    )


J3_SQL = """
SELECT c_mktsegment, count(*) AS n_customers,
       round(cast(sum(cast(c_acctbal as decimal(24,6))) as double), 2) AS sum_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# --- A4 baseline-stats analog: per-group coverage/span ------------------------
# ref: /root/reference/tools/compute_baseline.py:31-76
def a4_order_baseline_stats(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        F.expr("timestampdiff(DAY, min(o_orderdate), max(o_orderdate))").alias(
            "span_days"
        ),
        F.round(F.sum(F.col("o_totalprice").cast(_DEC)).cast("double"), 2).alias(
            "sum_totalprice"
        ),
    )


A4_SQL = """
SELECT o_orderstatus, count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
       date_diff('day', min(o_orderdate), max(o_orderdate)) AS span_days,
       round(cast(sum(cast(o_totalprice as decimal(24,6))) as double), 2) AS sum_totalprice
FROM orders GROUP BY o_orderstatus
"""




# --- rollup / grouping sets ---------------------------------------------------
def a10_rollup_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double"), 2)
            .alias("sum_price"),
            F.grouping_id().alias("grouping_level"),
        )
    )


A10_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(cast(sum(cast(l_extendedprice as decimal(24,6))) as double), 2) AS sum_price,
       grouping(l_returnflag) * 2 + grouping(l_linestatus) AS grouping_level
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- Q6: forecast revenue change (pure pushdown filter + single agg) ---------
def q6_forecast_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast(_DEC)
                ).cast("double"),
                2,
            ).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT round(cast(sum(cast(l_extendedprice * l_discount as decimal(24,6))) as double), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= timestamp '1997-01-01' AND l_shipdate < timestamp '1998-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.08 AND l_quantity < 24
"""


# --- Q18-style: large-volume customers (agg -> having -> join back) ----------
Q18_MIN_QTY = 250


def q18_large_volume_customers(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_quantity").cast(_DEC)).cast("double"), 2)
             .alias("total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_name"),
            F.col("o_orderkey"),
            F.col("o_orderdate"),
            F.col("total_qty"),
        )
    )


Q18_SQL = f"""
SELECT c_name, o_orderkey, o_orderdate, total_qty
FROM (
  SELECT l_orderkey,
         round(cast(sum(cast(l_quantity as decimal(24,6))) as double), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING round(cast(sum(cast(l_quantity as decimal(24,6))) as double), 2) > {Q18_MIN_QTY}
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q18_large_volume_customers": (q18_large_volume_customers, Q18_SQL),
    "q3_top_orders": (q3_top_orders, Q3_SQL),
    "q5_region_revenue": (q5_region_revenue, Q5_SQL),
    "o1_topk_orders_per_priority": (o1_topk_orders_per_priority, O1_SQL),
    "j3_customers_without_orders": (j3_customers_without_orders, J3_SQL),
    "a4_order_baseline_stats": (a4_order_baseline_stats, A4_SQL),
    "a10_rollup_revenue": (a10_rollup_revenue, A10_SQL),
}
