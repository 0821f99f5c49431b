"""The reference's concrete jobs, each as a declarative DataFrame pipeline.

Input is always the records DataFrame from sources/warc.py. Where the
reference runs per-record Python generators + `reduceByKey`
(sparkcc.py:212-217), these pipelines are select/filter/explode/groupBy
— Catalyst's partial aggregation replaces the hand-rolled map-side
combine, and the hot path stays in whole-stage codegen.

Output schemas mirror the reference jobs' `output_schema` (flattened:
nested `(tf, df)` structs become columns — same information, hash-
checkable shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cc_pyspark_spark.functions.text import tokenize
from cc_pyspark_spark.functions.url import surt_host_udf, urljoin_udf
from cc_pyspark_spark.sources.warc import header_values, is_html

NO_SERVER = "(no server in HTTP header)"
NO_IP = "(no IP address)"

#: F14 lenient bytes→str: invalid UTF-8 becomes U+FFFD instead of
#: failing the task (reference warn-and-skip semantics,
#: sitemaps_from_robotstxt.py:75-80) — ANSI `decode` would throw.
PAYLOAD_TEXT = "make_valid_utf8(cast(payload as string))"


def server_count(records: DataFrame) -> DataFrame:
    """server_count.py:40-67: count HTTP Server header values over
    response records; values dedup'd per record, fallback when absent."""
    resp = records.filter(F.col("record_type") == "response")
    servers = F.array_distinct(header_values("server"))
    key = F.explode(
        F.when(F.size(servers) > 0, servers).otherwise(F.array(F.lit(NO_SERVER)))
    )
    return (
        resp.select(key.alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("val"))
    )


def html_tag_count(records: DataFrame) -> DataFrame:
    """html_tag_count.py:14-26: per-page *distinct* HTML tag names
    (regex `<([a-z0-9]+)` on the payload), count = pages containing tag."""
    resp = records.filter((F.col("record_type") == "response") & is_html())
    tags = F.array_distinct(
        F.expr("regexp_extract_all(" + PAYLOAD_TEXT + ", '<([a-z0-9]+)', 1)")
    )
    return (
        resp.select(F.explode(tags).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("val"))
    )


def word_count(records: DataFrame) -> DataFrame:
    """word_count.py:16-39 over WET conversion records: per-word term
    frequency (tf) + document frequency (df). The reference's per-doc
    `Counter` pre-agg is the inner groupBy; Catalyst makes both levels
    partial+final hash aggregations."""
    wet = records.filter(F.col("record_type") == "conversion")
    toks = wet.select(
        "target_uri",
        F.explode(tokenize("" + PAYLOAD_TEXT + "")).alias("word"),
    )
    per_doc = toks.groupBy("target_uri", "word").agg(F.count("*").alias("cnt"))
    return per_doc.groupBy("word").agg(
        F.sum("cnt").cast("bigint").alias("tf"), F.count("*").alias("df")
    )


def server_ip_address(records: DataFrame) -> DataFrame:
    """server_ip_address.py:16-64: count (host, ip) pairs over response
    records with fallback for missing IPs."""
    resp = records.filter(F.col("record_type") == "response")
    return (
        resp.select(
            F.lower(F.parse_url("target_uri", F.lit("HOST"))).alias("host"),
            F.coalesce(F.col("warc_ip_address"), F.lit(NO_IP)).alias("ip"),
        )
        .filter(F.col("host").isNotNull())
        .groupBy("host", "ip")
        .agg(F.count("*").alias("val"))
    )


def sitemaps_from_robotstxt(records: DataFrame) -> DataFrame:
    """sitemaps_from_robotstxt.py:55-106: extract `Sitemap:` lines from
    robots.txt bodies, resolve relative URLs against the robots.txt URL
    (urljoin UDF — F6 has no builtin), aggregate announcing hosts per
    sitemap. Host list sorted for deterministic compare (FIXTURES.md)."""
    robots = records.filter(
        (F.col("record_type") == "response")
        & F.col("target_uri").endswith("/robots.txt")
    )
    lines = robots.select(
        "target_uri",
        F.explode(F.split(F.expr("" + PAYLOAD_TEXT + ""), "\r?\n")).alias("line"),
    )
    sitemap_raw = F.regexp_extract(F.col("line"), r"(?i)^sitemap:\s*(\S+)", 1)
    found = lines.select(
        "target_uri", sitemap_raw.alias("raw")
    ).filter(F.col("raw") != "")
    resolved = found.select(
        urljoin_udf(F.col("target_uri"), F.col("raw")).alias("sitemap_url"),
        F.lower(F.parse_url("target_uri", F.lit("HOST"))).alias("host"),
    )
    return resolved.groupBy("sitemap_url").agg(
        F.sort_array(F.collect_list("host")).alias("hosts")
    )


#: Subset of the WAT JSON envelope the link extractor reads
#: (wat_extract_links.py:211-255) — an explicit from_json schema keeps
#: parsing JVM-side instead of the reference's per-record json.loads.
WAT_ENVELOPE_SCHEMA = (
    "struct<Envelope: struct<"
    "`WARC-Header-Metadata`: struct<`WARC-Type`: string, `WARC-Target-URI`: string>, "
    "`Payload-Metadata`: struct<`HTTP-Response-Metadata`: struct<"
    "`HTML-Metadata`: struct<Links: array<struct<path: string, url: string>>>>>>>"
)


def wat_extract_host_links(records: DataFrame) -> DataFrame:
    """wat_extract_links.py (ExtractHostLinksJob core): WAT metadata
    records → host-level SURT edge list (s, t), deduplicated.

    JSON decoding happens in Catalyst (`from_json` with an explicit
    schema — only the needed subtree is materialized); SURT keys via
    the pandas UDF (F7). Pages with no outlinks emit the self-edge so
    every crawled host appears in the graph (wat_extract_links.py:116-122).
    """
    wat = records.filter(
        (F.col("record_type") == "metadata")
        & F.col("content_type").contains("application/json")
    )
    parsed = wat.select(
        F.from_json(F.expr("" + PAYLOAD_TEXT + ""), WAT_ENVELOPE_SCHEMA).alias(
            "w"
        )
    ).select(
        F.col("w.Envelope.`WARC-Header-Metadata`.`WARC-Target-URI`").alias("page_url"),
        F.col(
            "w.Envelope.`Payload-Metadata`.`HTTP-Response-Metadata`"
            ".`HTML-Metadata`.Links.url"
        ).alias("link_urls"),
    ).filter(F.col("page_url").isNotNull())
    exploded = parsed.select(
        "page_url",
        F.explode(
            F.when(
                F.size(F.coalesce("link_urls", F.array())) > 0, F.col("link_urls")
            ).otherwise(F.array(F.col("page_url")))  # self-edge fallback (F18)
        ).alias("link_url"),
    )
    edges = exploded.select(
        surt_host_udf(F.col("page_url")).alias("s"),
        surt_host_udf(F.col("link_url")).alias("t"),
    ).filter(F.col("s").isNotNull() & F.col("t").isNotNull())
    # Cluster output for compression + dedup locality
    # (wat_extract_links.py:314-320).
    return edges.dropDuplicates().sortWithinPartitions("s", "t")


def linkmap_to_parquet(spark, tsv_path: str, out_path: str):
    """linkmap2parquet.py:10-34 parity: TSV (s, t) pairs → dedup →
    sortWithinPartitions → parquet (clustered for compression)."""
    from cc_pyspark_spark.sources.tables import load_tsv_pairs, write_table  # noqa: PLC0415

    pairs = (
        load_tsv_pairs(spark, tsv_path)
        .dropna()
        .dropDuplicates()
        .sortWithinPartitions("s", "t")
    )
    write_table(pairs, out_path, fmt="parquet", compression="zstd")
    return spark.read.parquet(out_path)
