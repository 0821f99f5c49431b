"""Byte-fetch backends for archive access: local file, http(s) with
Range GETs, s3:// behind an injectable client, and hdfs:// behind an
injectable pyarrow filesystem.

Reference behavior being re-expressed (sparkcc.py:291-342): full-file
fetches for whole-archive processing, and ranged fetches
(`Range: bytes=o-(o+l-1)` HTTP header / boto3 ranged `get_object`) for
cc-index record lookups. This module is deliberately Spark-independent:
it runs inside Arrow `mapInPandas` workers and in plain unit tests.

The sandbox has no network, so the s3 client is an *injected*
dependency with the boto3 `get_object` call shape — tests inject a
fake AND (since r14, when boto3 became available in the environment) a
real boto3 client behind botocore's Stubber, which validates the call
shape with boto3's own parameter validation; production injects
`boto3.client("s3")` (or nothing, and the lazy import picks it up
where installed).
"""

from __future__ import annotations

from typing import Any

_S3_CLIENT: Any | None = None


def set_s3_client(client: Any | None) -> None:
    """Inject an s3 client exposing boto3's
    ``get_object(Bucket=..., Key=..., [Range=...]) -> {"Body": readable}``.
    Pass ``None`` to reset to the lazy boto3 default."""
    global _S3_CLIENT
    _S3_CLIENT = client


def _s3_client() -> Any:
    if _S3_CLIENT is not None:
        return _S3_CLIENT
    try:  # pragma: no cover - boto3 not bundled in the sandbox
        import boto3  # noqa: PLC0415

        return boto3.client("s3")
    except ImportError as exc:
        raise NotImplementedError(
            "s3:// fetch needs an injected client (sources.fetch.set_s3_client) "
            "or boto3 (reference: sparkcc.py:309-318)"
        ) from exc


_HDFS_FS: Any | None = None


def set_hdfs_filesystem(fs: Any | None) -> None:
    """Inject a filesystem exposing pyarrow.fs's
    ``open_input_file(path) -> seekable readable``. Pass ``None`` to
    reset to the lazy ``pyarrow.fs.HadoopFileSystem`` default."""
    global _HDFS_FS
    _HDFS_FS = fs


def _hdfs_fs(uri: str) -> tuple[Any, str]:
    """Resolve (filesystem, in-fs path) for an hdfs:// URI.

    Re-expresses the reference's pydoop.hdfs.open backend
    (sparkcc.py:344-352) over pyarrow's libhdfs binding — pydoop isn't
    public-PyPI-maintained for py3.11+, pyarrow.fs is the standard
    route. Tests inject a fake via `set_hdfs_filesystem`.
    """
    path = "/" + uri.removeprefix("hdfs://").partition("/")[2]
    if _HDFS_FS is not None:
        return _HDFS_FS, path
    try:  # pragma: no cover - libhdfs not present in the sandbox
        from pyarrow import fs as pafs  # noqa: PLC0415

        filesystem, path = pafs.FileSystem.from_uri(uri)
        return filesystem, path
    except (ImportError, OSError) as exc:
        raise NotImplementedError(
            "hdfs:// fetch needs an injected filesystem "
            "(sources.fetch.set_hdfs_filesystem) or a pyarrow libhdfs "
            "environment (reference: sparkcc.py:344-352)"
        ) from exc


def parse_s3_uri(uri: str) -> tuple[str, str]:
    rest = uri.removeprefix("s3://")
    bucket, _, key = rest.partition("/")
    if not bucket or not key:
        raise ValueError(f"malformed s3 uri: {uri!r}")
    return bucket, key


def resolve(path: str, input_base_url: str | None) -> str:
    """Prefix relative archive keys (e.g. ``crawl-data/...``) with the
    job's input base URL (sparkcc.py `--input_base_url`)."""
    if input_base_url and "://" not in path and not path.startswith("/"):
        return input_base_url.rstrip("/") + "/" + path
    return path


def open_stream(uri: str):
    """Open `uri` as a readable binary stream (no ranging).

    Used by the temp-dir spool path: remote archives stream to local
    disk instead of being held in memory (sparkcc.py:308-318
    TemporaryFile behavior).
    """
    if uri.startswith(("http://", "https://")):
        from urllib.request import urlopen  # noqa: PLC0415

        return urlopen(uri)
    if uri.startswith("s3://"):
        bucket, key = parse_s3_uri(uri)
        return _s3_client().get_object(Bucket=bucket, Key=key)["Body"]
    if uri.startswith("hdfs://"):
        filesystem, path = _hdfs_fs(uri)
        return filesystem.open_input_file(path)
    return open(uri.removeprefix("file://"), "rb")


def spool_to_local(uri: str, temp_dir: str) -> str:
    """Stream a remote archive into `temp_dir`; return the local path.

    Local paths are returned unchanged (nothing to spool). Caller owns
    deletion of the returned file when it differs from `uri`.
    """
    if not uri.startswith(("http://", "https://", "s3://", "hdfs://")):
        return uri.removeprefix("file://")
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    with open_stream(uri) as src, tempfile.NamedTemporaryFile(
        dir=temp_dir, suffix=".spool", delete=False
    ) as dst:
        try:
            shutil.copyfileobj(src, dst, length=1 << 20)
        except BaseException:
            # mid-copy failure (flaky remote, truncated object): don't
            # leak the partial spool file into temp_dir over a long job
            dst.close()
            os.unlink(dst.name)
            raise
        return dst.name


def fetch_bytes(uri: str, offset: int | None = None, length: int | None = None) -> bytes:
    """Fetch a whole object, or a byte range when ``offset`` is given.

    Ranged semantics are identical across backends: local seek+read,
    HTTP ``Range`` header GET (sparkcc.py:320-327), s3 ranged
    ``get_object`` (sparkcc.py:291-305). ``offset`` with
    ``length=None`` is an open-ended range (read to EOF) on every
    backend — ``Range: bytes=o-`` for http/s3, seek+read for
    local/hdfs.
    """
    ranged = offset is not None
    range_header = (
        f"bytes={offset}-" if length is None else f"bytes={offset}-{offset + length - 1}"
    ) if ranged else None
    if uri.startswith(("http://", "https://")):
        from urllib.request import Request, urlopen  # noqa: PLC0415

        req = Request(uri)
        if ranged:
            req.add_header("Range", range_header)
        with urlopen(req) as resp:
            return resp.read()
    if uri.startswith("s3://"):
        bucket, key = parse_s3_uri(uri)
        kwargs: dict[str, Any] = {"Bucket": bucket, "Key": key}
        if ranged:
            kwargs["Range"] = range_header
        return _s3_client().get_object(**kwargs)["Body"].read()
    if uri.startswith("hdfs://"):
        filesystem, path = _hdfs_fs(uri)
        with filesystem.open_input_file(path) as f:
            if ranged:
                f.seek(offset)
                return f.read(length)
            return f.read()
    path = uri.removeprefix("file://")
    with open(path, "rb") as f:
        if ranged:
            f.seek(offset)
            return f.read(length)
        return f.read()
