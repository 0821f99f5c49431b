"""Salted operators must agree exactly with their unsalted equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_pyspark_spark.operators.skew import salted_distinct_count, salted_join
from tests.conftest import SF_DIR


def test_salted_distinct_count_matches_plain(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    got = {
        r["l_returnflag"]: r["distinct_count"]
        for r in salted_distinct_count(li, ["l_returnflag"], "l_partkey").collect()
    }
    want = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    got = salted_join(orders, customer, "o_custkey", n_salts=4)
    want = orders.join(customer, "o_custkey")
    assert got.count() == want.count()
    key = ["o_orderkey", "c_name"]
    assert {tuple(r) for r in got.select(*key).collect()} == {
        tuple(r) for r in want.select(*key).collect()
    }


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "x"), (2, "y"), (99, "z")], ["k", "v"])
    small = spark.createDataFrame([(1, "A"), (2, "B")], ["k", "w"])
    out = salted_join(big, small, "k", n_salts=3, how="left")
    assert {tuple(r) for r in out.collect()} == {
        (1, "x", "A"),
        (2, "y", "B"),
        (99, "z", None),
    }
