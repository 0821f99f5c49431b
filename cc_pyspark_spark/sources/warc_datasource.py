"""`spark.read.format("warc")` — Python Data Source API (Spark 4).

The DataSource wrapper over the same parser as sources/warc.py:

    spark.dataSource.register(WarcDataSource)
    df = (spark.read.format("warc")
          .option("manifest", "manifest.txt")   # or option("paths", "a,b,c")
          .option("record_types", "response,metadata")
          .option("parse_http", "true")
          .load())

Each manifest line becomes one `InputPartition` (the archive file is
the unit of parallelism — gzip WARC is non-splittable), so Spark
schedules one file per task with full speculative-retry semantics.
Options mirror the mapInPandas source: parse-time record-type filter
(P10 pushdown), HTTP parsing toggle, payload on/off.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from cc_pyspark_spark.sources.warc import WARC_RECORD_SCHEMA


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_RECORD_SCHEMA

    def reader(self, schema) -> "WarcReader":
        return WarcReader(self.options)

    def streamReader(self, schema) -> "WarcStreamReader":  # noqa: N802
        return WarcStreamReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options
        manifest = options.get("manifest")
        paths = options.get("paths")
        if manifest:
            with open(manifest) as fh:
                self.paths = [ln.strip() for ln in fh if ln.strip()]
        elif paths:
            self.paths = [p for p in paths.split(",") if p]
        else:
            raise ValueError("warc source needs option 'manifest' or 'paths'")
        rt = options.get("record_types")
        self.record_types = set(rt.split(",")) if rt else None
        self.parse_http = options.get("parse_http", "true").lower() == "true"
        self.with_payload = options.get("with_payload", "true").lower() == "true"

    def partitions(self):
        return [_FilePartition(p) for p in self.paths]

    def read(self, partition: _FilePartition):
        return _read_archive(
            partition, self.record_types, self.parse_http, self.with_payload
        )


def _read_archive(partition: _FilePartition, record_types, parse_http, with_payload):
    """Executor-side parse shared by the batch and stream readers."""
    # Imports run on the executor — keep them inside the function.
    from cc_pyspark_spark.sources.warc import _record_rows  # noqa: PLC0415

    for row in _record_rows(
        partition.path,
        partition.path,
        record_types,
        parse_http,
        with_payload,
    ):
        yield tuple(row[f] for f in (
            "warc_filename",
            "warc_record_offset",
            "warc_record_length",
            "record_type",
            "content_type",
            "target_uri",
            "warc_date",
            "warc_ip_address",
            "identified_payload_type",
            "http_status",
            "http_headers",
            "payload",
        ))


class WarcStreamReader(DataSourceStreamReader):
    """`spark.readStream.format("warc")` — incremental manifest tailing.

    The manifest is an append-only text file of archive URIs (the shape
    a crawler publishes: new WARC paths appended as segments land). The
    stream offset is simply the number of manifest lines consumed; each
    microbatch turns the newly appended lines into one `InputPartition`
    per archive, so parsing stays on executors with the same
    parse-time `record_types` pushdown as the batch reader. Replay of a
    committed batch re-reads the same line range — offsets are
    deterministic, giving end-to-end exactly-once with a checkpoint.
    """

    def __init__(self, options: dict):
        self.options = options
        self.manifest = options.get("manifest")
        if not self.manifest:
            raise ValueError("warc stream source needs option 'manifest'")
        rt = options.get("record_types")
        self.record_types = set(rt.split(",")) if rt else None
        self.parse_http = options.get("parse_http", "true").lower() == "true"
        self.with_payload = options.get("with_payload", "true").lower() == "true"

    def _lines(self) -> list[str]:
        try:
            with open(self.manifest) as fh:
                return [ln.strip() for ln in fh if ln.strip()]
        except FileNotFoundError:
            return []

    def initialOffset(self) -> dict:  # noqa: N802
        return {"line": 0}

    def latestOffset(self) -> dict:  # noqa: N802
        return {"line": len(self._lines())}

    def partitions(self, start: dict, end: dict):
        lines = self._lines()[start["line"] : end["line"]]
        return [_FilePartition(p) for p in lines]

    def read(self, partition: _FilePartition):
        return _read_archive(
            partition, self.record_types, self.parse_http, self.with_payload
        )

    def commit(self, end: dict) -> None:
        pass  # offsets derive from the manifest itself; nothing to clean
