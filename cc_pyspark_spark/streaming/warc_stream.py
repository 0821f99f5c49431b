"""Incremental WARC ingestion: a stream of manifest files.

A crawl publishes manifests (text files listing new archive files)
into a directory; `stream_warc_records` turns that into a streaming
records DataFrame — Structured Streaming's file source tracks which
manifests were already processed (checkpointed, exactly-once), and each
micro-batch parses only the newly listed archives through the same
Arrow-batched parser as the batch source.

This is the streaming analog of the reference's restartable
intermediate output (wat_extract_links.py:298-312): restart-safety
comes from the checkpoint instead of manual table bookkeeping.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc_pyspark_spark.sources.warc import _SCHEMA_COLS, WARC_RECORD_SCHEMA, _record_rows


def stream_warc_records(
    spark: SparkSession,
    manifest_dir: str,
    record_types: set[str] | None = None,
    parse_http: bool = True,
    with_payload: bool = True,
) -> DataFrame:
    paths = (
        spark.readStream.format("text")
        .load(manifest_dir)
        .select(F.trim("value").alias("path"))
        .filter(F.col("path") != "")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                try:
                    rows.extend(
                        _record_rows(path, path, record_types, parse_http, with_payload)
                    )
                except OSError:
                    continue
            yield pd.DataFrame(rows, columns=_SCHEMA_COLS)

    return paths.mapInPandas(parse, WARC_RECORD_SCHEMA)
