"""Relational operator inventory (SURVEY.md §2.2-2.7), one named query each.

Each query exercises one operator family from the reference —
projection/filter (P1-P7), joins (J1 + the standard types the reference
gets free from Spark), aggregation (A1-A7), windows (W1-W2),
sort/limit/top-k (O1-O5), set ops (U1) — over the driver star schema,
paired with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cc_pyspark_spark.catalog import Catalog
from cc_pyspark_spark.plans.registry import register


# ---------------------------------------------------------------- scans


@register(
    "scan_filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity > 45
""",
    description="P1: column projection + pushed-down predicates (ReadSchema pruning)",
    tags=("scan",),
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "filter_in_like",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type, p_size
FROM part
WHERE p_type LIKE 'PROMO%' AND p_size IN (1, 5, 9, 13) AND p_brand <> 'Brand#13'
""",
    description="P7: LIKE / IN / <> predicate mix",
    tags=("scan",),
)
def filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return t.part.filter(
        F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 5, 9, 13)
        & (F.col("p_brand") != "Brand#13")
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@register(
    "project_computed",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       o_totalprice * 0.1 AS fee,
       upper(o_orderpriority) AS prio
FROM orders
WHERE o_orderstatus = 'F'
""",
    description="P3: computed columns (date part, arithmetic, string fn)",
    tags=("scan",),
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return t.orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        (F.col("o_totalprice") * 0.1).alias("fee"),
        F.upper("o_orderpriority").alias("prio"),
    )


@register(
    "sql_passthrough",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderstatus = 'O'
GROUP BY o_orderpriority
""",
    description="P7: full SQL passthrough via session.sql over temp views "
    "(parity with sparkcc.py:502-506 execute_query)",
    tags=("sql",),
)
def sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cat.register_views()
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderstatus = 'O'
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------- joins


@register(
    "join_inner_dims",
    oracle="""
SELECT n_nationkey, n_name AS nation, r_name AS region
FROM nation JOIN region ON n_regionkey = r_regionkey
""",
    description="J1: inner equi-join with rename projection (P2)",
    tags=("join",),
)
def join_inner_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return t.nation.join(
        F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(
        "n_nationkey",
        F.col("n_name").alias("nation"),
        F.col("r_name").alias("region"),
    )


@register(
    "join_left_outer_count",
    oracle="""
SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
    description="Left outer join + count of non-null (zero-order customers kept)",
    tags=("join",),
)
def join_left_outer_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
""",
    description="Left-semi join (EXISTS)",
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 300000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""",
    description="Left-anti join (NOT EXISTS): customers with no big-ticket order",
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 400000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


# ----------------------------------------------------------- aggregation


@register(
    "agg_count_by_key",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY event_type
""",
    description="A1: count-by-key (reduceByKey sum monoid → hash agg)",
    tags=("agg",),
)
def agg_count_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


@register(
    "agg_distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    description="A5: distinct (hash agg, no value columns)",
    tags=("agg",),
)
def agg_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return t.lineitem.select("l_returnflag", "l_linestatus").distinct()


@register(
    "agg_count_distinct",
    oracle="""
SELECT c_nationkey,
       COUNT(DISTINCT c_mktsegment) AS n_segments,
       COUNT(*) AS n_customers
FROM customer GROUP BY c_nationkey
""",
    description="COUNT(DISTINCT) — expand+two-phase agg (beyond-reference breadth)",
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return t.customer.groupBy("c_nationkey").agg(
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.count("*").alias("n_customers"),
    )


@register(
    "agg_collect_sorted_list",
    oracle="""
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), ',') AS nations
FROM nation GROUP BY n_regionkey
""",
    description="A4: list-append monoid → collect_list + sort_array "
    "(determinism rule from FIXTURES.md; sitemaps hosts analog)",
    tags=("agg",),
)
def agg_collect_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return t.nation.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "agg_rollup",
    oracle="""
SELECT COALESCE(r_name, 'ALL') AS region,
       COALESCE(n_name, 'ALL') AS nation,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal,
       COUNT(*) AS n
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    description="ROLLUP grouping sets (beyond-reference; SURVEY §2.4 'not present')",
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    joined = t.customer.join(
        F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_bal"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "total_bal",
            "n",
        )
    )


@register(
    "agg_pivot_status",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_f,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_o
FROM lineitem GROUP BY l_returnflag
""",
    description="Pivot (beyond-reference): groupBy().pivot().count()",
    tags=("agg",),
)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .count()
        .select(
            "l_returnflag",
            F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
        )
    )


# --------------------------------------------------------------- windows


@register(
    "window_dense_ids",
    oracle="""
SELECT c_name AS name,
       ROW_NUMBER() OVER (ORDER BY c_name) AS id
FROM (SELECT DISTINCT c_name FROM customer)
""",
    description="W1/W2: dense sequential ID assignment by sorted name "
    "(vertex-ID parity with hostlinks_to_graph.py:96-111, done with "
    "row_number instead of monotonically_increasing_id)",
    tags=("window",),
)
def window_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    names = t.customer.select(F.col("c_name").alias("name")).distinct()
    # Single global window = single-partition sort, acceptable only for
    # final small outputs (same trade-off the reference makes with
    # coalesce(1); at scale use zipWithIndex-style per-partition offsets).
    return names.withColumn(
        "id", F.row_number().over(W.orderBy("name")).cast("bigint")
    )


@register(
    "window_topn_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
""",
    description="Top-N per group via ranked window (beyond-reference)",
    tags=("window",),
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t.orders.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_running_sum",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS run_sum
FROM events
""",
    description="Running sum per key (frame spec; exact decimal accumulation)",
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t.events.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("run_sum"),
    )


@register(
    "window_lag_delta",
    oracle="""
SELECT event_id, user_id, value - prev AS delta FROM (
  SELECT event_id, user_id, value,
         LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events) WHERE prev IS NOT NULL
""",
    description="LAG window (inter-event delta per user)",
    tags=("window",),
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t.events.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNotNull())
        .select("event_id", "user_id", (F.col("value") - F.col("prev")).alias("delta"))
    )


# --------------------------------------------------------- sort / limit


@register(
    "topk_global",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 15
""",
    description="O4: global top-k (Catalyst TakeOrderedAndProject, no full sort)",
    tags=("topk",),
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.lineitem.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(15)
    )


# ---------------------------------------------------------------- set ops


@register(
    "set_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
    description="U1: union + distinct (vertex name-pool analog, "
    "hostlinks_to_graph.py:82-83)",
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(t.supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register(
    "set_intersect",
    oracle="""
SELECT c_mktsegment AS seg FROM customer WHERE c_nationkey < 5
INTERSECT
SELECT c_mktsegment FROM customer WHERE c_nationkey >= 20
""",
    description="INTERSECT (beyond-reference; SURVEY §2.7 'not present')",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    lo = t.customer.filter(F.col("c_nationkey") < 5).select(
        F.col("c_mktsegment").alias("seg")
    )
    hi = t.customer.filter(F.col("c_nationkey") >= 20).select(
        F.col("c_mktsegment").alias("seg")
    )
    return lo.intersect(hi)


@register(
    "set_except",
    oracle="""
SELECT p_brand FROM part WHERE p_size <= 2
EXCEPT
SELECT p_brand FROM part WHERE p_size >= 49
""",
    description="EXCEPT (brands with tiny parts but no near-max-size parts)",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    small = t.part.filter(F.col("p_size") <= 2).select("p_brand").distinct()
    big = t.part.filter(F.col("p_size") >= 49).select("p_brand").distinct()
    return small.subtract(big)


@register(
    "agg_cube",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
       COALESCE(l_linestatus, 'ALL') AS lstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    description="CUBE grouping sets (beyond-reference; SURVEY §2.4 'not present')",
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "n",
            "sum_qty",
        )
    )


@register(
    "agg_approx_count_distinct",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
       CAST(COUNT(*) AS BIGINT) AS n,
       TRUE AS within_5pct
FROM orders GROUP BY 1
""",
    description="approx_count_distinct (HyperLogLog++) per order priority — "
    "the sketch path for 100 TB COUNT(DISTINCT). The raw HLL estimate is "
    "engine-specific so it cannot be hash-compared; instead the query "
    "emits the exact distinct count plus a within_5pct boolean checking "
    "the sketch against it, and the oracle asserts TRUE — the sketch "
    "path stays exercised while every emitted column is deterministic. "
    "(The exact count here is gate instrumentation; the deployment path "
    "is the sketch alone.)",
    tags=("agg", "sketch"),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    agg = t.orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("__approx"),
        F.count_distinct("o_custkey").alias("exact_custs"),
        F.count("*").alias("n"),
    )
    tol = F.col("exact_custs").cast("double") * F.lit(0.05)
    err = F.abs(F.col("__approx") - F.col("exact_custs")).cast("double")
    return agg.select(
        "o_orderpriority", "exact_custs", "n", (err <= tol).alias("within_5pct")
    )


@register(
    "join_full_outer",
    oracle="""
SELECT COALESCE(c.k, s.k) AS nationkey,
       COALESCE(c.n_cust, 0) AS n_cust,
       COALESCE(s.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer
      WHERE c_acctbal > 9000 GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier
                 GROUP BY 1) s
ON c.k = s.k
""",
    description="Full outer join with null-side coalescing (beyond-reference)",
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    c = (
        t.customer.filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = t.supplier.groupBy(F.col("s_nationkey").alias("k")).agg(
        F.count("*").alias("n_supp")
    )
    return (
        c.join(s, "k", "full_outer")
        .select(
            F.col("k").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@register(
    "window_rank_suite",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       FIRST_VALUE(o_orderkey) OVER w AS first_ok
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
    description="Ranking function suite: rank/dense_rank/ntile/first_value "
    "over one window spec (beyond-reference §2.5 breadth)",
    tags=("window",),
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return t.orders.filter(F.col("o_custkey") < 50).select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.first("o_orderkey").over(w).alias("first_ok"),
    )


@register(
    "string_functions",
    oracle="""
SELECT p_partkey,
       concat_ws('|', p_brand, p_type) AS brand_type,
       substr(p_name, 1, 8) AS name_prefix,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       replace(lower(p_name), ' ', '_') AS slug,
       CAST(length(p_name) AS BIGINT) AS name_len,
       regexp_replace(p_type, '[AEIOU]', '*', 'g') AS devoweled
FROM part WHERE p_partkey < 200
""",
    description="F4/F14 string library: concat_ws, substr, lpad, replace, "
    "length, regexp_replace — all JVM-side",
    tags=("scalar",),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return t.part.filter(F.col("p_partkey") < 200).select(
        "p_partkey",
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.lower("p_name"), F.lit(" "), F.lit("_")).alias("slug"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.regexp_replace("p_type", "[AEIOU]", "*").alias("devoweled"),
    )


@register(
    "date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS d,
       CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT)
         AS month_start,
       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date
FROM orders WHERE o_orderkey < 500
""",
    description="Date/time library: extract parts, date_trunc, interval "
    "arithmetic (epoch-normalized output for cross-engine hashing)",
    tags=("scalar",),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return t.orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        F.unix_timestamp(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), "yyyy-MM-dd"
        ).alias("due_date"),
    )


@register(
    "subquery_correlated",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
""",
    description="Correlated scalar subquery (decorrelated by Catalyst into "
    "an aggregate + join) via SQL passthrough",
    tags=("sql", "join"),
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cat.register_views()
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50,
       quantile_cont(l_quantity, 0.9) AS p90,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag
""",
    description="Exact interpolated percentiles + min/max per group "
    "(percentile_approx is the sketch variant at scale)",
    tags=("agg",),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
       COALESCE(l_linestatus, 'ALL') AS lstatus,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""",
    description="Arbitrary GROUPING SETS (neither rollup nor cube) via SQL",
    tags=("agg", "sql"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cat.register_views()
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
               COALESCE(l_linestatus, 'ALL') AS lstatus,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "set_union_all",
    oracle="""
SELECT nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey FROM supplier
) GROUP BY nationkey
""",
    description="UNION ALL (bag semantics) + count — the non-dedup union",
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("nationkey"))
        .unionAll(t.supplier.select(F.col("s_nationkey").alias("nationkey")))
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
    )


@register(
    "json_extract_props",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
            THEN 'high' ELSE 'low' END AS k_band
FROM events
WHERE props IS NOT NULL
""",
    description="F11-lite: JSON scalar extraction from a string column "
    "(get_json_object) + derived banding",
    tags=("scalar", "json"),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return t.events.filter(F.col("props").isNotNull()).select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "array_functions",
    oracle="""
SELECT p_partkey,
       string_split(p_name, ' ')[1] AS first_word,
       string_split(p_name, ' ')[-1] AS last_word,
       CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
       array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), '|')
         AS sorted_words
FROM part WHERE p_partkey <= 100
""",
    description="Array function library: split, element_at (first/last), "
    "size, array_distinct + sort_array + array_join",
    tags=("scalar", "array"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    words = F.split("p_name", " ")
    return t.part.filter(F.col("p_partkey") <= 100).select(
        "p_partkey",
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.size(words).cast("bigint").alias("n_words"),
        F.array_join(F.sort_array(F.array_distinct(words)), "|").alias(
            "sorted_words"
        ),
    )


@register(
    "join_merge_hint",
    oracle="""
SELECT o_orderkey, o_totalprice, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 450000
""",
    description="Join strategy hint (SHUFFLE_MERGE): same semantics as the "
    "Catalyst-chosen plan, explicitly sort-merge — the hint API surface",
    tags=("join",),
)
def join_merge_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.orders.filter(F.col("o_totalprice") > 450000)
        .join(t.customer.hint("shuffle_merge"), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_totalprice", "c_name")
    )


@register(
    "conditional_functions",
    oracle="""
SELECT s_suppkey,
       COALESCE(NULLIF(s_name, 'Supplier#000000001'), '(anonymized)') AS display,
       GREATEST(s_acctbal, 0.0) AS bal_floor,
       LEAST(CAST(s_nationkey AS BIGINT), 10) AS nation_cap,
       CASE WHEN s_acctbal < 0 THEN 'debt'
            WHEN s_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS bal_band,
       CAST(s_acctbal >= 0 AS INT) AS non_negative
FROM supplier
""",
    description="Conditional/null function library: nullif, coalesce, "
    "greatest/least, multi-branch CASE, boolean cast",
    tags=("scalar",),
)
def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return t.supplier.select(
        "s_suppkey",
        F.coalesce(
            F.nullif(F.col("s_name"), F.lit("Supplier#000000001")),
            F.lit("(anonymized)"),
        ).alias("display"),
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("bal_floor"),
        F.least(F.col("s_nationkey").cast("bigint"), F.lit(10)).alias("nation_cap"),
        F.when(F.col("s_acctbal") < 0, "debt")
        .when(F.col("s_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        (F.col("s_acctbal") >= 0).cast("int").alias("non_negative"),
    )


@register(
    "agg_arg_max",
    oracle="""
WITH m AS (
  SELECT c_nationkey,
         max(struct_pack(bal := c_acctbal, key := c_custkey, name := c_name)) AS t
  FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey, t.bal AS top_bal, t.key AS top_custkey, t.name AS top_name
FROM m
""",
    description="argmax per group via struct-max (deterministic tie-break "
    "through the embedded unique key; the max_by/arg_max aggregate class)",
    tags=("agg",),
)
def agg_arg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    packed = F.struct(
        F.col("c_acctbal").alias("bal"),
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
    )
    return (
        t.customer.groupBy("c_nationkey")
        .agg(F.max(packed).alias("t"))
        .select(
            "c_nationkey",
            F.col("t.bal").alias("top_bal"),
            F.col("t.key").alias("top_custkey"),
            F.col("t.name").alias("top_name"),
        )
    )


@register(
    "merge_upsert",
    oracle="""
WITH chg AS (
  SELECT c_custkey AS k,
         CASE WHEN c_custkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
         c_acctbal + 100.0 AS new_bal
  FROM customer WHERE c_custkey % 3 = 0 OR c_custkey % 7 = 0
), ins AS (
  SELECT c_custkey + 1000000 AS k, c_custkey * 1.5 AS new_bal
  FROM customer WHERE c_custkey % 11 = 0
)
SELECT c.c_custkey,
       CASE WHEN chg.op = 'U' THEN chg.new_bal ELSE c.c_acctbal END
         AS c_acctbal,
       CASE WHEN chg.op = 'U' THEN 'updated' ELSE 'kept' END AS action
FROM customer c LEFT JOIN chg ON c.c_custkey = chg.k
WHERE chg.op IS NULL OR chg.op <> 'D'
UNION ALL
SELECT k, new_bal, 'inserted' FROM ins
""",
    description="MERGE/upsert semantics (update + delete + insert in one "
    "pass) as a single left join with a post-filter plus a union of "
    "inserts — Spark core has no MERGE statement, so this is the "
    "composition a lakehouse writer runs; one shuffle keyed on the "
    "merge key, changes side broadcastable when small",
    tags=("relational", "join"),
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    cust = t.customer
    chg = (
        cust.filter((F.col("c_custkey") % 3 == 0) | (F.col("c_custkey") % 7 == 0))
        .select(
            F.col("c_custkey").alias("k"),
            F.when(F.col("c_custkey") % 7 == 0, "D").otherwise("U").alias("op"),
            (F.col("c_acctbal") + 100.0).alias("new_bal"),
        )
    )
    ins = cust.filter(F.col("c_custkey") % 11 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        (F.col("c_custkey") * 1.5).alias("c_acctbal"),
        F.lit("inserted").alias("action"),
    )
    merged = (
        cust.join(chg, cust.c_custkey == chg.k, "left")
        .filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            "c_custkey",
            F.when(F.col("op") == "U", F.col("new_bal"))
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            F.when(F.col("op") == "U", "updated")
            .otherwise("kept")
            .alias("action"),
        )
    )
    return merged.unionAll(ins)


@register(
    "agg_salted_distinct_count",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_count
FROM lineitem GROUP BY 1
""",
    description="Skew-proof exact COUNT(DISTINCT) (operators/skew.py "
    "salted_distinct_count): hot-key distinct sets cannot partial-aggregate, "
    "so a plain per-key distinct drowns one reducer; salting by "
    "hash(value) makes stage-1 distinct sets disjoint per salt bucket and "
    "stage-2 a plain SUM. Three giant groups over the whole fact table is "
    "exactly that shape. Result is provably identical to the unsalted "
    "count — the oracle is the plain COUNT(DISTINCT)",
    tags=("agg", "skew", "scale"),
)
def agg_salted_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.skew import salted_distinct_count

    t = Catalog(spark, sf_dir)
    return salted_distinct_count(
        t.lineitem, ["l_returnflag"], "l_partkey", n_salts=16
    )


#: Salt fan-out for the skew-join demo: the hot key's rows spread over
#: this many sub-keys. Production sizes this to (hot-key rows /
#: target-partition rows); 8 is plenty for the fixture.
_SKEW_SALT = 8


@register(
    "join_skew_salted",
    oracle="""
WITH big AS (
  SELECT CASE WHEN l_suppkey % 4 = 0 THEN 0 ELSE l_suppkey END AS k,
         l_extendedprice
  FROM lineitem
), dim AS (
  SELECT s_suppkey AS k, CAST(s_nationkey AS BIGINT) AS grp FROM supplier
  UNION ALL SELECT 0, CAST(-1 AS BIGINT)
)
SELECT dim.grp,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(big.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         AS revenue
FROM big JOIN dim ON big.k = dim.k
GROUP BY 1
""",
    description="Salted skew join (the 100 TB hot-key pattern, "
    "explicitly constructed): a quarter of lineitem collapses onto "
    "key 0 — a vanilla shuffle join would send every hot row to ONE "
    "reducer. The fact side gets salt = l_orderkey % 8; the dim side "
    "replicates each row 8x via explode(sequence(0,7)); the join keys "
    "on (k, salt), so the hot key's rows spread over 8 partitions and "
    "each fact row still matches EXACTLY one dim replica — results "
    "are salt-invariant by construction, which is why the oracle is "
    "the PLAIN unsalted join (salting must change the exchange, never "
    "the answer). hint('merge') pins the shuffle plan so the salted "
    "exchange is what actually executes at any SF (AQE would "
    "broadcast this fixture dim and hide the pattern; at production "
    "scale the dim side is a fact table too and broadcast is off the "
    "table). Dim replication is 8x a SMALL side — the salt trades "
    "bounded replication for bounded per-partition fan-in, same "
    "shape AQE's skew-join mitigation applies at runtime; this is "
    "the static variant you reach for when the skew is KNOWN",
    tags=("join", "scale"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    big = t.lineitem.select(
        F.when(F.col("l_suppkey") % 4 == 0, F.lit(0))
        .otherwise(F.col("l_suppkey"))
        .alias("k"),
        (F.col("l_orderkey") % _SKEW_SALT).cast("int").alias("salt"),
        "l_extendedprice",
    )
    dim = (
        t.supplier.select(
            F.col("s_suppkey").alias("k"),
            F.col("s_nationkey").cast("bigint").alias("grp"),
        )
        .unionAll(
            spark.range(1).select(
                F.lit(0).alias("k"), F.lit(-1).cast("bigint").alias("grp")
            )
        )
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(_SKEW_SALT - 1)))
        )
        .withColumn("salt", F.col("salt").cast("int"))
    )
    joined = big.hint("merge").join(dim, ["k", "salt"])
    return joined.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue"),
    )
