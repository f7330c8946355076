"""TPC-H-shaped multi-join battery (SURVEY.md §2.5 T35-T38 extended).

The reference has no join operator at all — its task layer hand-rolls
join-shaped multicast lookups (reference tasks/plants_classifier.py:206-230).
This module exercises the join planning Spark gives us for free across the
classic TPC-H shapes: selective fact-dim joins, correlated EXISTS
(rewritten as a semi join), scalar correlated subqueries (rewritten as an
aggregate + equi-join), and multi-way join + agg + top-k.

Scale notes: every dimension here (customer per-key slice, nation,
per-part averages) is orders of magnitude smaller than lineitem, so the
plans Catalyst picks are broadcast hash joins on the fact table with a
single shuffle for the final aggregate — the shape that survives a 100×
scale-up. AQE converts shuffle joins to broadcast at runtime when a
filtered side turns out small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_engine_cdps_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# shipping_priority — Q3 shape: σ(customer) ⨝ σ(orders) ⨝ σ(lineitem),
# revenue per order, top 10. Catalyst pushes all three filters into the
# scans; the filtered customer slice broadcasts; TakeOrderedAndProject
# avoids a global sort.
# ---------------------------------------------------------------------------

CUTOFF = "1998-06-01"


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(CUTOFF).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(CUTOFF).cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{CUTOFF} 00:00:00'
  AND l_shipdate  > TIMESTAMP '{CUTOFF} 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# priority_order_counts — Q4 shape: correlated EXISTS over lineitem
# (orders with at least one item shipped >30 days after the order date),
# counted per priority. The DataFrame form is the semi join Catalyst
# would rewrite EXISTS into anyway: equi-join on the key plus the
# non-equi residual predicate, duplicate-free by construction.
# ---------------------------------------------------------------------------

def priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


PRIORITY_ORDER_COUNTS_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 30 DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# small_qty_revenue — Q17 shape: scalar correlated subquery (per-part
# average quantity) against the same fact table. Expressed as a partial
# aggregate joined back to lineitem: the per-part average table is tiny
# (O(|part|)), so it broadcasts; the fact table is scanned once per side
# but never shuffled on a non-key.
# ---------------------------------------------------------------------------

def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


SMALL_QTY_REVENUE_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_small_lines
FROM lineitem l
JOIN (
  SELECT l_partkey, avg(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
) a ON l.l_partkey = a.l_partkey
WHERE l.l_quantity < 0.5 * a.avg_qty
"""


# ---------------------------------------------------------------------------
# top_return_customers — Q10 shape: 4-way join (lineitem σ returnflag ⨝
# orders ⨝ customer ⨝ nation), revenue per customer, top 20. Dimension
# sides broadcast; one shuffle on c_custkey for the aggregate.
# ---------------------------------------------------------------------------

def top_return_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


TOP_RETURN_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# brand_supplier_counts — Q16 shape: count distinct suppliers per
# (brand, type) over the lineitem ⨝ part join. Distinct-aggregate over a
# join: Spark expands to a two-phase aggregate (partial distinct per
# partition then final), so the shuffle carries (brand, type, suppkey)
# triples, not raw lineitems.
# ---------------------------------------------------------------------------

def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"))
        .limit(50)
    )


BRAND_SUPPLIER_COUNTS_SQL = """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC
LIMIT 50
"""
