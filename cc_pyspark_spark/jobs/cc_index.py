"""cc-index query path (sparkcc.py:469-661 CCIndexSparkJob family).

Three composable stages, all already idiomatic Spark in the reference —
kept that way here:

1. `load_ccindex`  — parquet scan (+ optional explicit schema JSON, so
   evolved-schema tables skip footer merging, README.md:240-249) +
   temp view.
2. `execute_query` — full Spark SQL over the view; Catalyst does
   predicate pushdown / partition pruning on `crawl=`/`subset=` dirs.
3. `fetch_records_for_query` — matched coordinate rows → byte-range
   record fetch (sources/warc.fetch_warc_records), the index
   nested-loop join against archive storage (J2) that cannot be a
   Catalyst join.

`cc_index_word_count` composes all three into the reference's
cc_index_word_count.py pipeline with the regex HTML→text backend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cc_pyspark_spark.functions.html import html_to_text
from cc_pyspark_spark.functions.text import tokenize
from cc_pyspark_spark.sources.warc import fetch_warc_records

COORD_COLUMNS = ("url", "warc_filename", "warc_record_offset", "warc_record_length")


def load_ccindex(
    spark: SparkSession,
    path: str,
    table_name: str = "ccindex",
    schema_json: str | None = None,
) -> DataFrame:
    reader = spark.read.format("parquet")
    if schema_json:
        reader = reader.schema(T.StructType.fromJson(__import__("json").loads(schema_json)))
    df = reader.load(path)
    df.createOrReplaceTempView(table_name)
    return df


def execute_query(spark: SparkSession, query: str) -> DataFrame:
    """--query passthrough (sparkcc.py:502-506); caller owns the view."""
    return spark.sql(query)


def fetch_records_for_query(
    spark: SparkSession,
    sqldf: DataFrame,
    num_input_partitions: int = 32,
    decode_payload_text: bool = False,
) -> DataFrame:
    """Matched coordinate rows → byte-range record fetch.

    When the user's index query selected ``content_charset``, forward it
    through the coordinate projection (sparkcc.py:645-648) so the
    per-record decode can honour the index-declared charset instead of
    falling back to the utf-8 → latin-1 chain (sources/warc.py:292-294).
    """
    cols = list(COORD_COLUMNS)
    if "content_charset" in sqldf.columns:
        cols.append("content_charset")
    coords = sqldf.select(*cols)
    return fetch_warc_records(
        spark,
        coords,
        num_input_partitions=num_input_partitions,
        decode_payload_text=decode_payload_text,
    )


def cc_index_word_count(
    spark: SparkSession,
    index_path: str,
    query: str,
    num_input_partitions: int = 32,
) -> DataFrame:
    """cc_index_word_count.py parity: index SQL → ranged fetch → HTML
    text → per-word (tf, df). HTML→text is the regex backend
    (functions/html.py); plug a parser UDF for bs4/resiliparse parity."""
    load_ccindex(spark, index_path)
    sqldf = execute_query(spark, query)
    records = fetch_records_for_query(
        spark, sqldf, num_input_partitions=num_input_partitions
    )
    resp = records.filter(F.col("record_type") == "response")
    text = html_to_text(F.expr("make_valid_utf8(cast(payload as string))"))
    toks = resp.select(
        "target_uri", F.explode(tokenize(text)).alias("word")
    )
    per_doc = toks.groupBy("target_uri", "word").agg(F.count("*").alias("cnt"))
    return per_doc.groupBy("word").agg(
        F.sum("cnt").cast("bigint").alias("tf"), F.count("*").alias("df")
    )


def cc_index_export(
    spark: SparkSession,
    index_path: str,
    query: str,
    output_path: str,
    num_output_partitions: int = 10,
    fmt: str = "parquet",
    compression: str = "gzip",
) -> int:
    """cc_index_export.py parity: SQL over the index → table export.

    Mirrors the reference's persist → count (logged action) →
    repartition → write sequence (sparkcc.py:508-534).
    """
    from cc_pyspark_spark.sources.tables import write_table  # noqa: PLC0415

    load_ccindex(spark, index_path)
    sqldf = execute_query(spark, query).persist()
    n = sqldf.count()
    write_table(
        sqldf,
        output_path,
        fmt=fmt,
        compression=compression,
        num_partitions=num_output_partitions,
    )
    sqldf.unpersist()
    return n
