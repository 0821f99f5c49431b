"""File-level MD5 job (md5sum.py parity, S10/F15/U4).

The reference shells out to `md5sum` on a named temp file
(md5sum.py:17-20) because its framework only hands jobs a local path.
Spark-first this is two builtins: the `binaryFile` source (whole-file
bytes as a column) + `F.md5` — no temp files, no subprocess, no Python.
The general external-tool case (U4) stays available via mapInPandas
over `CCFileProcessor`-style named temp files; md5 does not need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def md5sum(spark: SparkSession, path_glob: str) -> DataFrame:
    """(file name, md5 hex) per input file."""
    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file"),
            F.md5("content").alias("md5"),
        )
    )
