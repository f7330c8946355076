"""Advanced analytics battery: regression aggregates, distribution
moments, mergeable sketches, recursive CTEs, collations, and SQL
session variables.

The reference's aggregation surface stops at count/sum/avg/min/max
(reference tasks/accident_analysis.py:110-115); everything here is a
declared engine extension (SURVEY.md §2.4 "absent in reference"),
expressed through Spark SQL built-ins so Catalyst keeps partial
aggregation and whole-stage codegen. Float outputs are rounded
identically on both sides so the driver's value hash is stable.

Scale stance shared by every query in this file: each one is a single
hash-aggregate (or aggregate + broadcast of a handful of rows) whose
shuffle carries O(groups) rows, not O(input) — the shapes survive a
100× scale-up unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_engine_cdps_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# regr_price_qty — least-squares regression aggregates (regr_slope /
# regr_intercept / regr_r2 / regr_count) of extendedprice on quantity
# per returnflag. These are one-pass, map-side-combinable moment
# aggregates (sums of x, y, xy, x², y²) — the distributed-friendly way
# to fit millions of per-group trend lines without any ML library.
# ---------------------------------------------------------------------------

def regr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 3).alias(
            "slope"
        ),
        F.round(
            F.expr("regr_intercept(l_extendedprice, l_quantity)"), 2
        ).alias("intercept"),
        F.round(F.expr("regr_r2(l_extendedprice, l_quantity)"), 6).alias(
            "r2"
        ),
        F.expr("regr_count(l_extendedprice, l_quantity)").alias("n"),
    )


REGR_PRICE_QTY_SQL = """
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 3)     AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
       regr_count(l_extendedprice, l_quantity)               AS n
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# quantity_moments — 3rd/4th standardized central moments (skewness,
# excess kurtosis) per returnflag, computed from raw power sums
# E[x]..E[x⁴] with the identical closed form on both engines (Spark's
# skewness()/kurtosis() and DuckDB's use different bias corrections, so
# the oracle-matched columns are the explicit population formulas).
# Spark's built-ins are then self-validated against the explicit values
# to 1e-3, the same pattern approx_distinct_users uses for HLL.
# One pass, map-side partial aggregation of 4 power sums per group.
# ---------------------------------------------------------------------------

def quantity_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    agg = li.groupBy("l_returnflag").agg(
        F.avg(x).alias("a"),
        F.avg(x * x).alias("e2"),
        F.avg(x * x * x).alias("e3"),
        F.avg(x * x * x * x).alias("e4"),
        F.skewness(x).alias("builtin_skew"),
        F.kurtosis(x).alias("builtin_kurt"),
    )
    m2 = F.col("e2") - F.col("a") * F.col("a")
    m3 = (
        F.col("e3")
        - 3 * F.col("a") * F.col("e2")
        + 2 * F.col("a") * F.col("a") * F.col("a")
    )
    m4 = (
        F.col("e4")
        - 4 * F.col("a") * F.col("e3")
        + 6 * F.col("a") * F.col("a") * F.col("e2")
        - 3 * F.col("a") * F.col("a") * F.col("a") * F.col("a")
    )
    skew = m3 / F.pow(m2, F.lit(1.5))
    kurt = m4 / (m2 * m2) - 3
    return agg.select(
        "l_returnflag",
        F.round(F.col("a"), 4).alias("mean_qty"),
        F.round(m2, 4).alias("var_pop"),
        F.round(skew, 4).alias("skew_pop"),
        F.round(kurt, 4).alias("exkurt_pop"),
        (F.abs(F.col("builtin_skew") - skew) < 1e-3).alias("builtin_skew_ok"),
        (F.abs(F.col("builtin_kurt") - kurt) < 1e-3).alias("builtin_kurt_ok"),
    )


QUANTITY_MOMENTS_SQL = """
WITH s AS (
  SELECT l_returnflag,
         avg(l_quantity)                                     AS a,
         avg(l_quantity * l_quantity)                        AS e2,
         avg(l_quantity * l_quantity * l_quantity)           AS e3,
         avg(l_quantity * l_quantity * l_quantity * l_quantity) AS e4
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       round(a, 4)                                           AS mean_qty,
       round(e2 - a*a, 4)                                    AS var_pop,
       round((e3 - 3*a*e2 + 2*a*a*a) / pow(e2 - a*a, 1.5), 4) AS skew_pop,
       round((e4 - 4*a*e3 + 6*a*a*e2 - 3*a*a*a*a)
             / ((e2 - a*a) * (e2 - a*a)) - 3, 4)             AS exkurt_pop,
       TRUE AS builtin_skew_ok,
       TRUE AS builtin_kurt_ok
FROM s
"""


# ---------------------------------------------------------------------------
# hll_sketch_users — Spark 4 Apache DataSketches HLL surface
# (hll_sketch_agg / hll_union_agg / hll_sketch_estimate): per
# event_type, build one HLL sketch per user_id-parity shard, merge the
# shard sketches with hll_union_agg, and estimate. Self-validated
# within 5% of the exact distinct count (oracle emits the exact count
# and literal TRUE). The shard→union round-trip is exactly the 100 TB
# pattern: sketches partial-aggregate map-side, merge associatively
# across any partitioning, and can be persisted and unioned across
# days without rescanning history — unlike exact distinct, whose
# shuffle carries every (key, user) pair.
# ---------------------------------------------------------------------------

def hll_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    shards = (
        ev.withColumn("shard", F.col("user_id") % 2)
        .groupBy("event_type", "shard")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    )
    merged = shards.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("merged_sketch_within_5pct"),
    )


HLL_SKETCH_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS exact_users,
       TRUE AS merged_sketch_within_5pct
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# monthly_gapfill_revenue — recursive CTE (Spark 4 WITH RECURSIVE)
# generating the complete month calendar between the first and last
# order date, left-joined to monthly revenue so months with no orders
# surface as explicit zero rows (classic time-series gap-fill; the
# sequence()-based dense_event_timeline is the non-recursive sibling).
# The recursion is O(months) rows on the driver-side anchor — depth
# ~80 for 7 years of TPC-H — then one broadcast join against the
# aggregated (O(months)-row) revenue table; the orders scan aggregates
# map-side first, so the join never sees raw rows.
# ---------------------------------------------------------------------------

def monthly_gapfill_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    # Bound the recursion with two driver-side scalars (one tiny
    # min/max agg — a parallel scan reduced to one row). Inlining them
    # as literals keeps each recursion step a local date increment; a
    # correlated scalar subquery would re-execute per step (measured
    # 36 s → 2 s at sf0.01 for the ~80-step recursion).
    lo, hi = orders.agg(
        F.date_format(F.date_trunc("month", F.min("o_orderdate")), "yyyy-MM-dd"),
        F.date_format(F.date_trunc("month", F.max("o_orderdate")), "yyyy-MM-dd"),
    ).first()
    return spark.sql(
        f"""
        WITH RECURSIVE months(m) AS (
          SELECT DATE'{lo}'
          UNION ALL
          SELECT add_months(m, 1) FROM months WHERE m < DATE'{hi}'
        ),
        rev AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                 round(sum(o_totalprice), 2) AS revenue,
                 count(*) AS order_cnt
          FROM orders GROUP BY 1
        )
        SELECT date_format(months.m, 'yyyy-MM') AS month,
               coalesce(rev.revenue, 0.0)       AS revenue,
               coalesce(rev.order_cnt, 0)       AS order_cnt
        FROM months LEFT JOIN rev ON months.m = rev.m
        """
    )


MONTHLY_GAPFILL_REVENUE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT CAST(date_trunc('month', (SELECT min(o_orderdate) FROM orders)) AS DATE)
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
  WHERE m < CAST(date_trunc('month', (SELECT max(o_orderdate) FROM orders)) AS DATE)
),
rev AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         round(sum(o_totalprice), 2) AS revenue,
         count(*) AS order_cnt
  FROM orders GROUP BY 1
)
SELECT strftime(months.m, '%Y-%m') AS month,
       coalesce(rev.revenue, 0.0)  AS revenue,
       coalesce(rev.order_cnt, 0)  AS order_cnt
FROM months LEFT JOIN rev ON months.m = rev.m
"""


# ---------------------------------------------------------------------------
# collated_lang_counts — Spark 4 string collation (UTF8_LCASE): the
# documents' lang codes are deterministically case-mangled (even
# doc_ids uppercased), then counted per source with case-insensitive
# *collated* equality and COUNT(DISTINCT ... COLLATE UTF8_LCASE) —
# collation-aware comparison in the engine, not lower() normalization
# in user code (the oracle proves them equivalent). Collations run
# inside codegen'd comparators, so this stays a plain hash-aggregate.
# ---------------------------------------------------------------------------

def collated_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mangled = F.when(
        F.col("doc_id") % 2 == 0, F.upper(F.col("lang"))
    ).otherwise(F.col("lang"))
    d = docs.select("source", mangled.alias("lang_m"))
    d.createOrReplaceTempView("docs_mangled")
    return spark.sql(
        """
        SELECT source,
               count(CASE WHEN lang_m = 'en' COLLATE UTF8_LCASE
                          THEN 1 END)                          AS en_docs,
               count(DISTINCT lang_m COLLATE UTF8_LCASE)       AS distinct_langs_ci,
               count(DISTINCT lang_m)                          AS distinct_langs_cs
        FROM docs_mangled
        GROUP BY source
        """
    )


COLLATED_LANG_COUNTS_SQL = """
WITH d AS (
  SELECT source,
         CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS lang_m
  FROM documents
)
SELECT source,
       count(CASE WHEN lower(lang_m) = 'en' THEN 1 END) AS en_docs,
       count(DISTINCT lower(lang_m))                    AS distinct_langs_ci,
       count(DISTINCT lang_m)                           AS distinct_langs_cs
FROM d
GROUP BY source
"""


# ---------------------------------------------------------------------------
# sql_variable_pricey_parts — SQL session variables (Spark 4 DECLARE /
# SET VAR) + parameterized EXECUTE IMMEDIATE: the price threshold is
# computed once into a session variable, then bound into the main
# query with a `?` parameter marker. The variable holds one scalar on
# the driver — the 100 TB-safe way to thread a computed constant into
# a query without a join (Catalyst folds it into the pushed-down
# predicate, so the part scan prunes on it).
# ---------------------------------------------------------------------------

def sql_variable_pricey_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    spark.sql("DECLARE OR REPLACE VARIABLE price_thr DOUBLE DEFAULT 0.0")
    spark.sql("SET VAR price_thr = (SELECT avg(p_retailprice) FROM part)")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT p_brand,
                  count(*)                        AS pricey_parts,
                  round(avg(p_retailprice), 2)    AS avg_pricey_price
           FROM part WHERE p_retailprice > ?
           GROUP BY p_brand'
        USING price_thr
        """
    )


SQL_VARIABLE_PRICEY_PARTS_SQL = """
SELECT p_brand,
       count(*)                     AS pricey_parts,
       round(avg(p_retailprice), 2) AS avg_pricey_price
FROM part
WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
GROUP BY p_brand
"""
