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


# --------------------------------------------------------------------------
# Q2/Q11/Q16/Q20 notes: the synthetic schema has no partsupp table, so the
# part↔supplier relation is derived from lineitem (distinct pairs; unit
# supply cost := MIN(l_extendedprice / l_quantity) over the pair's
# lineitems). Q12/Q13/Q17/Q21/Q22 substitute available columns for the
# missing l_shipmode / o_comment / p_container / receipt dates / c_phone
# — each keeps the reference query's *plan shape* (the thing under test).


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
rcost AS (
  SELECT l_partkey, supplycost, s_acctbal, s_name, n_name
  FROM cost
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM rcost JOIN part ON l_partkey = p_partkey
WHERE p_size BETWEEN 1 AND 10 AND p_type = 'LARGE'
  AND supplycost = (SELECT MIN(r2.supplycost) FROM rcost r2
                    WHERE r2.l_partkey = rcost.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    description="Q2 shape: correlated min-cost subquery (min-cost supplier "
    "per part within a region) + dim joins + deterministic top-k",
    tags=("join", "subquery", "topk"),
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    cost = (
        t.lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"))
    )
    rcost = (
        cost.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("l_partkey", "supplycost", "s_acctbal", "s_name", "n_name")
    )
    # correlated scalar min → groupBy-min + equi-join (shuffles on
    # l_partkey once; no single-partition window)
    min_cost = rcost.groupBy("l_partkey").agg(
        F.min("supplycost").alias("min_cost")
    ).withColumnRenamed("l_partkey", "mc_partkey")
    return (
        rcost.join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("supplycost") == F.col("min_cost")),
        )
        .join(
            t.part.filter(
                F.col("p_size").between(1, 10) & (F.col("p_type") == "LARGE")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name"), F.col("s_name"),
            F.col("p_partkey"),
        )
        .limit(100)
    )


@register(
    "tpch_q7_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
""",
    description="Q7 shape: bidirectional nation-pair volume by ship year "
    "(two broadcast joins against the same dim under different roles)",
    tags=("join", "agg"),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | (
        (F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dsum("l_extendedprice * (1 - l_discount)", "revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle="""
SELECT o_year,
       CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_2'
                          THEN volume ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
       / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
) all_nations
GROUP BY o_year
""",
    description="Q8 shape: national market share — conditional/total "
    "decimal-sum ratio per order year across an 8-way join",
    tags=("join", "agg"),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    base = (
        t.lineitem.join(
            t.part.filter(F.col("p_type") == "PROMO"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t.orders.filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(t.region), F.col("n1_region") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.expr("l_extendedprice * (1 - l_discount)").alias("volume"),
            "supp_nation",
        )
    )
    return base.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", F.col("volume"))
                .otherwise(0.0)
                .cast("decimal(18,6)")
            ).cast("double")
            / F.sum(F.col("volume").cast("decimal(18,6)")).cast("double")
        ).alias("mkt_share")
    )


@register(
    "tpch_q9_product_type_profit",
    oracle="""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - 0.1 * p_retailprice * l_quantity
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
""",
    description="Q9 shape: profit by supplier nation and order year; "
    "supply cost surrogate 0.1*p_retailprice (no partsupp in the schema)",
    tags=("join", "agg"),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.lineitem.join(
            t.part.filter(F.col("p_name").like("%red%")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.expr(
                "l_extendedprice * (1 - l_discount)"
                " - 0.1 * p_retailprice * l_quantity"
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.sum(F.col("amount").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_profit")
        )
    )


@register(
    "tpch_q11_important_parts",
    oracle="""
WITH natline AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT l_partkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS part_value
FROM natline
GROUP BY l_partkey
HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
     > (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        FROM natline) * 0.001
""",
    description="Q11 shape: group value vs scalar-subquery fraction of the "
    "global total (HAVING against a 1-row aggregate, no partsupp)",
    tags=("agg", "subquery"),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    natline = (
        t.lineitem.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_3")
        .select("l_partkey", "l_extendedprice")
    )
    per_part = natline.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("part_value")
    )
    # 1-row global total broadcast-cross-joined into the HAVING filter —
    # the same fold-the-scalar-into-the-plan trick as PageRank's
    # dangling mass (no driver collect between jobs).
    total = natline.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("grand_total")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("grand_total") * 0.001)
        .select("l_partkey", "part_value")
    )


@register(
    "tpch_q12_priority_shipping",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
""",
    description="Q12 shape: late-shipment priority counts (conditional "
    "sums over a fact join; l_returnflag stands in for l_shipmode)",
    tags=("join", "agg"),
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
    description="Q13 shape: two-level aggregation — orders-per-customer "
    "histogram including zero-order customers (left outer + count of "
    "counts; priority filter stands in for the o_comment NOT LIKE)",
    tags=("join", "agg"),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    per_cust = (
        t.customer.join(
            t.orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    description="Q15 shape: top supplier by quarterly revenue — reused "
    "aggregate (the reference's CREATE VIEW) + scalar-max equality",
    tags=("agg", "subquery"),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    revenue = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_dsum("l_extendedprice * (1 - l_discount)", "total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        t.supplier.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    description="Q16 shape: distinct part-supplier pairs (lineitem stands "
    "in for partsupp), NOT-IN anti-join on a supplier exclusion set "
    "(negative balance stands in for the complaints comment), "
    "count-distinct per part attribute group",
    tags=("join", "agg"),
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    ps = t.lineitem.select("l_partkey", "l_suppkey").distinct()
    excluded = t.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(excluded, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            t.part.filter(
                (F.col("p_brand") != "Brand#5")
                & (F.col("p_type") != "PROMO")
                & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3' AND p_size <= 10
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                  / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
    description="Q17 shape: correlated per-part average-quantity threshold "
    "(decimal-sum/count avg for cross-engine determinism; p_size range "
    "stands in for p_container)",
    tags=("join", "subquery", "agg"),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    per_part_avg = t.lineitem.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    return (
        t.lineitem.join(
            t.part.filter((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 10)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(per_part_avg, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q20_potential_promotion",
    oracle="""
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%red%'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 50)
""",
    description="Q20 shape: nested IN-subquery with HAVING (suppliers who "
    "moved >50 units of matching parts in a year) → semi-join chain",
    tags=("join", "subquery"),
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    movers = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            t.part.filter(F.col("p_name").like("%red%")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        t.supplier.join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_1")
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    description="Q21 shape: EXISTS + NOT-EXISTS correlated anti-join pair "
    "(the last shipper in multi-supplier finished orders; shipdate "
    "stands in for receipt/commit dates)",
    tags=("join", "subquery", "topk"),
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    l1 = (
        t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            t.orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .drop("o_orderkey")
    )
    l2 = t.lineitem.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    waiting = (
        l1.join(
            l2,
            (F.col("x_orderkey") == F.col("l_orderkey"))
            & (F.col("x_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l2,
            (F.col("x_orderkey") == F.col("l_orderkey"))
            & (F.col("x_suppkey") != F.col("l_suppkey"))
            & (F.col("x_shipdate") > F.col("l_shipdate")),
            "left_anti",
        )
    )
    return (
        waiting.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_2")
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey IN (1, 5, 9, 13, 17, 21, 24)
  AND c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
    FROM customer
    WHERE c_acctbal > 0 AND c_nationkey IN (1, 5, 9, 13, 17, 21, 24))
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
""",
    description="Q22 shape: above-average-balance customers with no "
    "urgent orders, grouped by country (nationkey stands in for the "
    "phone country code; every synthetic customer has orders, so the "
    "anti-join excludes urgent ones; decimal-sum/count average)",
    tags=("subquery", "agg"),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    codes = (1, 5, 9, 13, 17, 21, 24)
    in_codes = t.customer.filter(F.col("c_nationkey").isin(*codes))
    avg_bal = in_codes.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    return (
        in_codes.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").cast("bigint").alias("cntrycode"))
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )
