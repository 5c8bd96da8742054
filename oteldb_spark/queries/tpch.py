"""General analytics sanity queries over the TPC-H-ish tables.

These anchor the engine's generic scan/agg/join path (and bench.py's
headline numbers).  Money sums run in DECIMAL so Spark and DuckDB are
exact-equal, then surface as rounded doubles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from .registry import register


# TPC-H Q1-style pricing summary over lineitem
@register(
    "tpch_q1",
    """SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS sum_disc_price,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE), 2) AS sum_charge,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
)
def tpch_q1(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
            F.round(F.sum(price).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(price * (F.lit(1) - disc)).cast("double"), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double"), 2
            ).alias("sum_charge"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


# join + broadcast path: revenue by nation (customer ⨝ orders ⨝ nation)
@register(
    "tpch_revenue_by_nation",
    """SELECT n_name,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name""",
)
def tpch_revenue_by_nation(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double"), 2
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )
