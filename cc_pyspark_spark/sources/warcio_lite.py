"""Minimal WARC/1.0 reader+writer (pure Python, public ISO 28500 format).

The execution environment has neither `warcio` nor `fastwarc`, so the
engine ships its own small parser. It covers what the reference's
record model needs (SURVEY.md §1.1): WARC/WAT/WET containers, the five
record types, gzip *member-per-record* files (the Common Crawl layout —
non-splittable, so parallelism is per-file; sparkcc.py:53,213),
byte-range record access by (offset, length) (sparkcc.py:291-305), and
legacy ARC containers auto-detected and surfaced as WARC records
(`arc2warc=True` parity, sparkcc.py:385-387).

This module is deliberately independent of Spark: it runs inside
Arrow-batched `mapInPandas` workers (sources/warc.py) and in tests.
"""

from __future__ import annotations

import io
import zlib
from dataclasses import dataclass, field

CRLF = b"\r\n"


@dataclass
class WarcRecord:
    """One parsed WARC record + its location in the container file."""

    headers: dict[str, str]  # WARC header name (canonical case) → value
    payload: bytes  # record block after optional HTTP-header split
    offset: int = 0  # byte offset of the record (compressed file: member start)
    length: int = 0  # stored length (compressed file: member length)
    http_status: int | None = None
    http_headers: list[tuple[str, str]] = field(default_factory=list)

    @property
    def rec_type(self) -> str:
        return self.headers.get("WARC-Type", "")

    @property
    def content_type(self) -> str:
        return self.headers.get("Content-Type", "")

    @property
    def target_uri(self) -> str | None:
        return self.headers.get("WARC-Target-URI")


def _parse_header_block(block: bytes) -> tuple[str, dict[str, str]]:
    """Parse `WARC/1.x` + header lines → (version, headers).

    One decode for the whole block (hot path: ~8 lines/record at
    millions of records) — equivalent to per-line decodes because CRLF
    bytes can never occur inside a multi-byte UTF-8 sequence, so
    replacement-character placement is identical.
    """
    lines = block.decode("utf-8", "replace").split("\r\n")
    version = lines[0]
    headers: dict[str, str] = {}
    for line in lines[1:]:
        if not line:
            continue
        name, _, value = line.partition(":")
        headers[name.strip()] = value.strip()
    return version, headers


def parse_http_response(body: bytes) -> tuple[int | None, list[tuple[str, str]], bytes]:
    """Split an `application/http` block into (status, headers, payload).

    Header names are lower-cased; multi-valued headers are preserved as
    repeated (name, value) pairs (server_count.py:52-67 semantics).
    """
    sep = body.find(b"\r\n\r\n")
    if sep < 0:
        return None, [], body
    # latin-1 is bytewise, so one decode of the head block is exactly
    # equivalent to per-line decodes (hot path).
    head, payload = body[:sep].decode("latin-1"), body[sep + 4 :]
    lines = head.split("\r\n")
    status = None
    first = lines[0]
    if first.startswith("HTTP/"):
        parts = first.split(None, 2)
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    headers = []
    for line in lines[1:]:
        name, sep2, value = line.partition(":")
        if sep2:
            headers.append((name.strip().lower(), value.strip()))
    return status, headers, payload


#: Streaming read unit. Worker memory for the parse is bounded by
#: O(_CHUNK + one record / one gzip member), never the archive size.
_CHUNK = 1 << 20


class _ChunkSource:
    """Uniform chunked reader over bytes or a binary file-like object.

    Never calls ``read()`` without a size — the whole point of the
    streaming parse is that a 1 GB ``.warc.gz`` is consumed in
    ``_CHUNK`` slices (sparkcc.py:381-410 iterates `ArchiveIterator`
    over a spooled stream the same way).
    """

    def __init__(self, src):
        if isinstance(src, (bytes, bytearray, memoryview)):
            self._buf: bytes | None = bytes(src)
            self._pos = 0
            self._readf = None
        else:
            self._buf = None
            self._readf = src.read

    def read(self, n: int = _CHUNK) -> bytes:
        if self._readf is not None:
            return self._readf(n) or b""
        chunk = self._buf[self._pos : self._pos + n]
        self._pos += len(chunk)
        return chunk


class _RecordAssembler:
    """Incremental WARC record parser over a growing byte buffer.

    ``feed`` returns the records completed by the new bytes; ``flush``
    drains what a clean EOF leaves behind. Record ``offset``/``length``
    are relative to the assembled stream (the plain-file case); the
    gzip path overwrites them with member coordinates.
    """

    def __init__(self):
        self._buf = bytearray()
        self._start = 0  # parse cursor into _buf
        self._abs = 0  # absolute offset of _buf[_start]
        self._dead = False  # non-WARC garbage seen: stop (tolerant)

    def feed(self, data: bytes) -> list[WarcRecord]:
        if self._dead:
            return []
        self._buf += data
        return self._drain(final=False)

    def flush(self) -> list[WarcRecord]:
        return [] if self._dead else self._drain(final=True)

    def _drain(self, final: bool) -> list[WarcRecord]:
        out: list[WarcRecord] = []
        buf = self._buf
        while True:
            s = self._start
            end = buf.find(b"\r\n\r\n", s)
            if end < 0:
                break  # header incomplete — wait (or tolerant EOF stop)
            if bytes(buf[s : s + 5]) != b"WARC/":
                self._dead = True  # garbage between records: stop parsing
                break
            _, headers = _parse_header_block(bytes(buf[s:end]))
            # Garbage Content-Length raises ValueError → caller counts
            # the archive as failed (sparkcc.py:390-392 semantics).
            length = int(headers.get("Content-Length", "0"))
            body_start = end + 4
            rec_end = body_start + length
            if len(buf) < rec_end + (0 if final else 4):
                break  # body (or separator lookahead) incomplete — wait
            nxt = rec_end
            while nxt + 2 <= len(buf) and bytes(buf[nxt : nxt + 2]) == CRLF:
                nxt += 2
            if not final and nxt + 2 > len(buf):
                break  # separator run may continue in the next chunk
            out.append(
                WarcRecord(
                    headers=headers,
                    payload=bytes(buf[body_start:rec_end]),
                    offset=self._abs,
                    length=nxt - s,
                )
            )
            self._abs += nxt - s
            self._start = nxt
            if self._start > _CHUNK:  # compact: keep the buffer small
                del buf[: self._start]
                self._start = 0
        return out


def _arc_date_iso(d14: str) -> str:
    """ARC 14-digit timestamp (YYYYMMDDHHMMSS) → WARC ISO-8601."""
    if len(d14) == 14 and d14.isdigit():
        return (
            f"{d14[0:4]}-{d14[4:6]}-{d14[6:8]}T"
            f"{d14[8:10]}:{d14[10:12]}:{d14[12:14]}Z"
        )
    return d14


class _ArcAssembler:
    """Incremental parser for legacy ARC (v1/v2) containers, presenting
    records in WARC terms — the engine's equivalent of the reference
    reading ARC through `ArchiveIterator(..., arc2warc=True)`
    (sparkcc.py:385-387).

    ARC record = one space-separated header line
    (v1: `url ip date content-type length`, v2: ten fields ending in
    length) followed by `length` body bytes. Mapping: the leading
    `filedesc://` record becomes `warcinfo`; URL records become
    `response` with `application/http; msgtype=response` content (ARC
    http bodies embed the HTTP headers, so the shared HTTP split in
    `iter_warc_records` applies unchanged).
    """

    def __init__(self):
        self._buf = bytearray()
        self._start = 0
        self._abs = 0
        self._dead = False

    def feed(self, data: bytes) -> list[WarcRecord]:
        if self._dead:
            return []
        self._buf += data
        return self._drain()

    def flush(self) -> list[WarcRecord]:
        return [] if self._dead else self._drain()

    def _drain(self) -> list[WarcRecord]:
        out: list[WarcRecord] = []
        buf = self._buf
        while True:
            s = self._start
            # skip inter-record newline separators
            while s < len(buf) and buf[s] in (0x0A, 0x0D):
                s += 1
            nl = buf.find(b"\n", s)
            if nl < 0:
                self._abs += s - self._start
                self._start = s
                break  # header line incomplete — wait
            # CRLF-terminated ARC header lines occur in the wild (and
            # warcio tolerates them) — strip the \r or int(fields[-1])
            # below rejects the whole archive (ADVICE r6).
            fields = bytes(buf[s:nl]).rstrip(b"\r").split(b" ")
            if len(fields) not in (5, 10):
                self._dead = True  # not an ARC header line: stop (tolerant)
                break
            # Garbage length raises ValueError → caller counts the
            # archive failed (sparkcc.py:390-392 semantics).
            length = int(fields[-1])
            body_start = nl + 1
            rec_end = body_start + length
            if len(buf) < rec_end:
                break  # body incomplete — wait
            url = fields[0].decode("utf-8", "replace")
            ctype = fields[3].decode("utf-8", "replace")
            headers = {
                "WARC-Type": (
                    "warcinfo" if url.startswith("filedesc://") else "response"
                ),
                "WARC-Target-URI": url,
                "WARC-Date": _arc_date_iso(fields[2].decode("ascii", "replace")),
                "WARC-IP-Address": fields[1].decode("ascii", "replace"),
                "Content-Length": str(length),
                "Content-Type": (
                    "application/http; msgtype=response"
                    if url.startswith(("http://", "https://"))
                    else ctype
                ),
                "ARC-Content-Type": ctype,
            }
            out.append(
                WarcRecord(
                    headers=headers,
                    payload=bytes(buf[body_start:rec_end]),
                    offset=self._abs + (s - self._start),
                    length=rec_end - s,
                )
            )
            self._abs += rec_end - self._start
            self._start = rec_end
            if self._start > _CHUNK:  # compact: keep the buffer small
                del buf[: self._start]
                self._start = 0
        return out


def _looks_like_arc(first_bytes: bytes) -> bool:
    """A whole ARC file leads with `filedesc://`; a single ranged-fetch
    member leads with a bare `url ip date content-type length` line."""
    if first_bytes.startswith(b"filedesc://"):
        return True
    nl = first_bytes.find(b"\n", 0, 4096)
    if nl < 0:
        return False
    fields = first_bytes[:nl].rstrip(b"\r").split(b" ")
    return (
        len(fields) in (5, 10)
        and fields[-1].isdigit()
        and b"://" in fields[0]
    )


def _pick_assembler(first_bytes: bytes):
    """WARC vs legacy ARC, from the first payload bytes of the stream."""
    if first_bytes.startswith(b"WARC/"):
        return _RecordAssembler
    if _looks_like_arc(first_bytes):
        return _ArcAssembler
    return _RecordAssembler


def _iter_gzip_stream(src: _ChunkSource, pending: bytes):
    """Yield raw records from a gzip WARC/ARC, one member at a time.

    Peak memory is one decompressed member (+ one compressed chunk) —
    the Common Crawl layout is record-per-member, so that is one
    record. Every record in a member carries the member's compressed
    (offset, length), the addressable unit for ranged re-fetch.
    """
    offset = 0
    asm_factory = None  # decided on the first member's first bytes
    while True:
        if not pending:
            pending = src.read()
            if not pending:
                return  # clean EOF on a member boundary
        d = zlib.decompressobj(wbits=31)
        asm = None
        recs: list[WarcRecord] = []
        consumed = 0
        while True:
            if not pending:
                pending = src.read()
                if not pending:  # EOF mid-member — corrupt archive
                    raise zlib.error(f"truncated gzip member at offset {offset}")
            data = d.decompress(pending)
            if d.eof:
                consumed += len(pending) - len(d.unused_data)
                pending = d.unused_data
            else:
                consumed += len(pending)
                pending = b""
            if data and asm is None:
                if asm_factory is None:
                    asm_factory = _pick_assembler(data)
                asm = asm_factory()
            if asm is not None and data:
                recs += asm.feed(data)
            if d.eof:
                break
        if asm is not None:
            recs += asm.flush()
        for rec in recs:
            rec.offset, rec.length = offset, consumed
            yield rec
        offset += consumed


def _iter_plain_stream(src: _ChunkSource, pending: bytes):
    asm = _pick_assembler(pending)()
    yield from asm.feed(pending)
    while True:
        chunk = src.read()
        if not chunk:
            break
        yield from asm.feed(chunk)
    yield from asm.flush()


def iter_warc_records(
    stream: io.BufferedIOBase | bytes,
    parse_http: bool = True,
    record_types: set[str] | None = None,
):
    """Iterate records from a WARC or legacy ARC file (plain or
    per-record gzip; ARC detected from the `filedesc://` lead record
    and presented as WARC records — arc2warc parity).

    ``stream`` may be raw bytes or any binary file-like object; file
    objects are consumed in `_CHUNK` reads, gzip member by member, so
    worker memory stays bounded by one record regardless of archive
    size (sparkcc.py:381-410 `ArchiveIterator`-over-spool parity).

    `record_types` is the parse-time filter (FastWARC `record_filter`
    parity, sparkcc_fastwarc.py:14) — filtered records are skipped
    before any HTTP parsing, which is the pushdown the reference gets
    from FastWARC's C parser.
    """
    src = _ChunkSource(stream)
    first = src.read()
    if not first:
        return
    if first[:2] == b"\x1f\x8b":
        raw_records = _iter_gzip_stream(src, first)
    else:
        raw_records = _iter_plain_stream(src, first)

    for rec in raw_records:
        if record_types and rec.rec_type not in record_types:
            continue
        if (
            parse_http
            and rec.rec_type in ("response", "request")
            and "application/http" in rec.content_type
        ):
            status, hdrs, payload = parse_http_response(rec.payload)
            rec.http_status = status
            rec.http_headers = hdrs
            rec.payload = payload
        yield rec


def read_record_at(
    path: str, offset: int, length: int, parse_http: bool = True
) -> WarcRecord | None:
    """Byte-range record access (sparkcc.py:291-305 ranged-GET analog).

    For gzip files (offset, length) address one gzip member; for plain
    files they address the record bytes directly. `path` may be a local
    path, ``http(s)://`` (Range-header GET) or ``s3://`` (ranged
    `get_object` via the injectable client in sources/fetch.py).
    """
    from cc_pyspark_spark.sources.fetch import fetch_bytes  # noqa: PLC0415

    raw = fetch_bytes(path, offset, length)
    for rec in iter_warc_records(raw, parse_http=parse_http):
        rec.offset = offset
        rec.length = length
        return rec
    return None


# ------------------------------------------------------------------ writer


class WarcWriter:
    """Writes WARC/1.0 records (optionally one gzip member each) and
    records (offset, length) coordinates — the fixture-side twin of the
    reader, also usable for WET side-output (wet_extractor.py:142-183).
    """

    def __init__(self, out: io.BufferedIOBase, gzip_members: bool = False):
        self.out = out
        self.gzip_members = gzip_members
        self.coordinates: list[tuple[int, int]] = []
        self._pos = 0

    def write_record(
        self,
        rec_type: str,
        payload: bytes,
        target_uri: str | None = None,
        content_type: str = "application/octet-stream",
        warc_date: str = "2017-03-20T10:00:00Z",
        ip_address: str | None = None,
        identified_payload_type: str | None = None,
        record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
        extra_headers: dict[str, str] | None = None,
    ) -> tuple[int, int]:
        headers = [
            ("WARC-Type", rec_type),
            ("WARC-Date", warc_date),
            ("WARC-Record-ID", record_id),
            ("Content-Length", str(len(payload))),
            ("Content-Type", content_type),
        ]
        if target_uri:
            headers.append(("WARC-Target-URI", target_uri))
        if ip_address:
            headers.append(("WARC-IP-Address", ip_address))
        if identified_payload_type:
            headers.append(("WARC-Identified-Payload-Type", identified_payload_type))
        for k, v in (extra_headers or {}).items():
            headers.append((k, v))
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}".encode() + CRLF for k, v in headers
        )
        record = head + CRLF + payload + CRLF + CRLF
        if self.gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, 31)
            record = co.compress(record) + co.flush()
        offset, length = self._pos, len(record)
        self.out.write(record)
        self._pos += length
        self.coordinates.append((offset, length))
        return offset, length


def http_response_block(
    payload: bytes,
    status: int = 200,
    headers: list[tuple[str, str]] | None = None,
) -> bytes:
    """Assemble an `application/http; msgtype=response` record block."""
    reason = {200: "OK", 301: "Moved Permanently", 302: "Found", 404: "Not Found"}.get(
        status, "OK"
    )
    lines = [f"HTTP/1.1 {status} {reason}".encode()]
    for k, v in headers or []:
        lines.append(f"{k}: {v}".encode())
    lines.append(f"Content-Length: {len(payload)}".encode())
    return CRLF.join(lines) + b"\r\n\r\n" + payload
