"""The WARC read path must stream end to end.

Two bounds, each pinned here:
  (a) the parser never calls ``read()`` without a size and never asks
      for more than one chunk at a time (a 1 GB archive is consumed in
      ``_CHUNK`` slices — reference sparkcc.py:381-410 iterates
      `ArchiveIterator` over a spooled stream the same way);
  (b) the Arrow stage emits one pandas batch per `batch_records`
      records, never one batch per archive — peak assembled row buffer
      stays far below one archive's record count.
"""

from __future__ import annotations

import io
import math

import pytest

from cc_pyspark_spark.sources.warc import _parse_paths
from cc_pyspark_spark.sources.warcio_lite import (
    _CHUNK,
    WarcWriter,
    http_response_block,
    iter_warc_records,
)

N_RECORDS = 600
BATCH = 64


@pytest.fixture(scope="module")
def big_archive(tmp_path_factory):
    d = tmp_path_factory.mktemp("big-warc")
    path = str(d / "big.warc.gz")
    with open(path, "wb") as fh:
        w = WarcWriter(fh, gzip_members=True)
        for i in range(N_RECORDS):
            block = http_response_block(
                f"payload {i} ".encode() * 50,
                status=200,
                headers=[("Content-Type", "text/plain")],
            )
            w.write_record(
                "response",
                block,
                target_uri=f"http://example.com/{i}",
                content_type="application/http; msgtype=response",
            )
    return path


class GuardedReader(io.RawIOBase):
    """File object that fails the test on any unbounded/oversized read."""

    def __init__(self, path: str, max_request: int = _CHUNK):
        self._f = open(path, "rb")
        self.max_request = max_request
        self.calls = 0

    def read(self, n: int = -1) -> bytes:
        assert n is not None and n >= 0, "parser called read() without a size"
        assert n <= self.max_request, (
            f"parser requested {n} bytes (> {self.max_request})"
        )
        self.calls += 1
        return self._f.read(n)

    def close(self):
        self._f.close()
        super().close()


def test_parser_reads_in_bounded_slices(big_archive):
    r = GuardedReader(big_archive)
    try:
        n = sum(1 for _ in iter_warc_records(r, parse_http=True))
    finally:
        r.close()
    assert n == N_RECORDS
    assert r.calls >= 2  # consumed in multiple slices, not one gulp


def test_arrow_stage_emits_bounded_batches(big_archive):
    frames = list(_parse_paths([big_archive], batch_records=BATCH))
    assert sum(len(f) for f in frames) == N_RECORDS
    assert max(len(f) for f in frames) <= BATCH
    assert len(frames) == math.ceil(N_RECORDS / BATCH)


def test_batches_span_archive_boundaries(big_archive):
    # Two archives in one task: batches keep flowing at the bound; the
    # stage never flushes per file (total frames ≈ total/BATCH, not 2).
    frames = list(_parse_paths([big_archive, big_archive], batch_records=BATCH))
    assert sum(len(f) for f in frames) == 2 * N_RECORDS
    assert max(len(f) for f in frames) <= BATCH
    assert len(frames) <= math.ceil(2 * N_RECORDS / BATCH) + 1


class _Metrics:
    """Accumulator-shaped counter bag (``+=`` like sc.accumulator)."""

    def __init__(self):
        self.records_processed = 0
        self.files_processed = 0
        self.files_failed = 0


def test_midfile_failure_discards_only_unflushed_tail(big_archive, tmp_path):
    corrupt = str(tmp_path / "corrupt.warc.gz")
    with open(big_archive, "rb") as f:
        data = f.read()
    with open(corrupt, "wb") as f:
        f.write(data[:-10])  # truncate the final gzip member mid-stream
    m = _Metrics()
    frames = list(
        _parse_paths([corrupt, big_archive], batch_records=BATCH, metrics=m)
    )
    total = sum(len(f) for f in frames)
    # The good archive is complete; the corrupt one contributed only
    # whole flushed batches (its unflushed tail was discarded).
    assert total >= N_RECORDS
    assert (total - N_RECORDS) % BATCH == 0
    assert m.files_failed == 1
    assert m.files_processed == 1
    assert m.records_processed == total
