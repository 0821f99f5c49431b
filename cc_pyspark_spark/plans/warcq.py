"""Registered query through the ``format("warc")`` Python DataSource.

Every other registered query reads parquet; this one drives the
Spark-4 Python Data Source API end to end (sources/warc_datasource.py:
options → InputPartition-per-archive → executor-side parse → HTTP
header/payload split) under the driver's correctness gate.

The WARC input is DERIVED from the `documents` table: each document
becomes one HTTP response record whose URL encodes (lang, doc_id) and
whose payload is a fixed HTML wrapping of the text. That makes the
oracle a genuine recomputation — DuckDB rebuilds the URL, payload md5,
and octet length straight from `documents` — rather than a committed
fixture. Archive generation is a deterministic fixture-construction
step (driver-side, tiny, atomic-rename idempotent), NOT the measured
operator; the measured path is the DataSource scan + parse.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc_pyspark_spark.catalog import Catalog
from cc_pyspark_spark.plans.registry import register

#: Archives per derived corpus — one InputPartition each, so the scan
#: parallelizes exactly as a real crawl segment would.
_N_FILES = 4

_HTML_PREFIX = "<html><body>"
_HTML_SUFFIX = "</body></html>"


def derived_warc_manifest(spark: SparkSession, sf_dir: str) -> str:
    """Build (once, idempotently) the documents-derived WARC corpus for
    `sf_dir`; return the manifest path.

    Deterministic: doc rows sort by doc_id, shard round-robin into
    `_N_FILES` archives, fixed WARC date/ids. Atomic-rename publish
    (the operators/wet.py pattern) makes concurrent builders converge
    on identical bytes.
    """
    from cc_pyspark_spark.sources.warcio_lite import (  # noqa: PLC0415
        WarcWriter,
        http_response_block,
    )

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = os.path.join("/tmp", f"cc_pyspark_spark_warcq_{tag}")
    manifest = os.path.join(out_dir, "manifest.txt")
    if os.path.exists(manifest):
        return manifest
    rows = (
        Catalog(spark, sf_dir)
        .documents.select("doc_id", "lang", "text")
        .orderBy("doc_id")
        .collect()
    )
    os.makedirs(out_dir, exist_ok=True)
    tmp_names = {}
    for fi in range(_N_FILES):
        path = os.path.join(out_dir, f"docs-{fi:02d}.warc.gz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            w = WarcWriter(fh, gzip_members=True)
            w.write_record(
                "warcinfo",
                b"software: cc-pyspark-spark derived-docs fixture\r\n",
                content_type="application/warc-fields",
            )
            for r in rows[fi::_N_FILES]:
                payload = (
                    f"{_HTML_PREFIX}{r['text']}{_HTML_SUFFIX}".encode()
                )
                block = http_response_block(
                    payload,
                    status=200,
                    headers=[("Content-Type", "text/html; charset=utf-8")],
                )
                w.write_record(
                    "response",
                    block,
                    target_uri=(
                        f"http://docs.example.org/{r['lang']}/{r['doc_id']}"
                    ),
                    content_type="application/http; msgtype=response",
                )
        tmp_names[path] = tmp
    for path, tmp in tmp_names.items():
        os.replace(tmp, path)  # atomic publish
    tmp_manifest = manifest + ".tmp"
    with open(tmp_manifest, "w") as fh:
        fh.write("\n".join(sorted(tmp_names)) + "\n")
    os.replace(tmp_manifest, manifest)
    return manifest


@register(
    "warc_source_payload_digest",
    oracle=f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       lang,
       'http://docs.example.org/' || lang || '/' || CAST(doc_id AS VARCHAR)
         AS url,
       CAST(octet_length(encode('{_HTML_PREFIX}' || text || '{_HTML_SUFFIX}'))
            AS BIGINT) AS payload_len,
       md5('{_HTML_PREFIX}' || text || '{_HTML_SUFFIX}') AS payload_md5
FROM documents
""",
    description="WARC ingestion via the Spark-4 Python Data Source API "
    "(format('warc')): the documents-derived archive corpus is scanned "
    "one-InputPartition-per-file, records parse executor-side with the "
    "HTTP payload split, and each response row carries its payload md5 "
    "and byte length keyed by the (lang, doc_id) encoded in its URL. "
    "Oracle recomputes url/length/md5 straight from `documents` — a "
    "full round-trip check of writer, DataSource reader, and HTTP parse",
    tags=("source", "warc"),
)
def warc_source_payload_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.sources.warc_datasource import (  # noqa: PLC0415
        WarcDataSource,
    )

    spark.dataSource.register(WarcDataSource)
    manifest = derived_warc_manifest(spark, sf_dir)
    df = (
        spark.read.format("warc")
        .option("manifest", manifest)
        .option("record_types", "response")
        .load()
    )
    return df.select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.regexp_extract("target_uri", r"^http://docs\.example\.org/([^/]+)/", 1)
        .alias("lang"),
        F.col("target_uri").alias("url"),
        F.length("payload").cast("bigint").alias("payload_len"),
        F.md5("payload").alias("payload_md5"),
    )
