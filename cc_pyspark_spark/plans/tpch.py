"""Headline analytical queries over the star schema (TPC-H-shaped).

These exercise the full relational surface the reference reaches only
through Spark SQL passthrough (sparkcc.py:502-506): multi-way joins,
partial+final hash aggregation, top-k, predicate pushdown into parquet.

Float determinism: money aggregates compute the row expression in IEEE
double (bit-identical across engines), cast the *row* value to
DECIMAL(18,6) (exact summation, no float-order sensitivity), sum, and
cast the total back to double. The DuckDB oracles use the same casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc_pyspark_spark.catalog import Catalog
from cc_pyspark_spark.plans.registry import register


def _dsum(expr: str, alias: str) -> F.Column:
    """Exact decimal sum of a row-level double expression → double."""
    return (
        F.sum(F.expr(expr).cast("decimal(18,6)")).cast("double").alias(alias)
    )


@register(
    "tpch_q1_pricing_summary",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    description="Pricing summary: scan+filter+hash agg (A1/A2 analog at SQL level)",
    tags=("agg", "bench"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            _dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price"),
            _dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge"),
            _dsum("l_discount", "sum_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate  > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    description="3-way join + agg + deterministic top-k (J1/O4 analog)",
    tags=("join", "topk", "bench"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_dsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
    description="6-way join with broadcast dims + hash agg (bench headliner)",
    tags=("join", "bench"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    # region/nation are bounded-size dims (25/5 rows at any sf):
    # broadcast unconditionally. supplier GROWS with sf (~10M rows at
    # sf=1000), so its join strategy is left to Catalyst/AQE, which
    # broadcasts while the size estimate is under the threshold and
    # degrades to a shuffle join when it is not — a hard-coded
    # F.broadcast would OOM executors at large sf.
    return (
        t.customer
        .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(_dsum("l_extendedprice * (1 - l_discount)", "revenue"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06
  AND l_quantity < 25
""",
    description="Selective scan: predicate pushdown + global agg (P7/A1)",
    tags=("scan", "bench"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 25)
        ).agg(
            _dsum("l_extendedprice * l_discount", "revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
SELECT c_custkey,
       c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    description="Fact-dim joins + agg + top-k with unique tiebreak",
    tags=("join", "topk", "bench"),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.customer
        .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q4_late_shipments",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
""",
    description="Q4 shape: EXISTS semi-join with a correlated date "
    "comparison + agg",
    tags=("join", "agg", "bench"),
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = t.lineitem.select("l_orderkey", "l_shipdate")
    matched = orders.join(
        late,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
SELECT CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
         AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
""",
    description="Q14 shape: conditional aggregation over a fact-dim join "
    "(promo revenue share)",
    tags=("join", "agg", "bench"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    joined = li.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
    promo = (
        "CASE WHEN p_type LIKE 'PROMO%' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
    )
    return joined.agg(
        F.sum(F.expr(promo).cast("decimal(18,6)"))
        .cast("double")
        .alias("promo_revenue"),
        F.sum(
            F.expr("l_extendedprice * (1 - l_discount)").cast("decimal(18,6)")
        )
        .cast("double")
        .alias("total_revenue"),
    )


@register(
    "tpch_q18_large_volume",
    oracle="""
SELECT c_custkey, c_name, o_orderkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 210)
GROUP BY c_custkey, c_name, o_orderkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
""",
    description="Q18 shape: HAVING subquery (large-volume orders) + "
    "3-way join + deterministic top-k",
    tags=("join", "agg", "topk", "bench"),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    big_orders = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 210)
        .select(F.col("l_orderkey").alias("big_ok"))
    )
    return (
        t.customer
        .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(big_orders, F.col("o_orderkey") == F.col("big_ok"), "left_semi")
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_qty")
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "tpch_q19_disjunctive",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40
       AND l_quantity >= 20 AND l_quantity <= 45)
""",
    description="Q19 shape: disjunctive multi-clause predicates across a "
    "join (tests CNF conversion / predicate pushdown through OR)",
    tags=("join", "scan", "bench"),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    joined = t.lineitem.join(
        F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey")
    )
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 40)
            & F.col("l_quantity").between(20, 45)
        )
    )
    return joined.filter(clause).agg(
        F.sum(
            F.expr("l_extendedprice * (1 - l_discount)").cast("decimal(18,6)")
        )
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n"),
    )
