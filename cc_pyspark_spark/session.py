"""SparkSession factory with a tuned configuration profile.

Replaces the reference's ad-hoc session build (sparkcc.py:174-193) and
its cluster submit-script tuning (run_ccpyspark_job_hadoop.sh:63-79)
with one profile: AQE on (runtime re-plan supersedes the reference's
hand-set partition counts), Arrow on (kills the pickle tax on every
Python boundary), UTC session time, Kryo + zstd for the cluster path.

On a real cluster none of the local[·] settings apply; the profile is
written so the same code runs unmodified under spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Sized for the local[32] test harness; on a cluster these are
# per-job knobs (see jobs/base.py CLI args).
DEFAULT_SHUFFLE_PARTITIONS = 32


def build_session(
    app_name: str = "cc-pyspark-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's conf profile."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cpus}]")

    conf = {
        # Driver heap: in local mode driver == all executors, and the
        # JVM otherwise launches with Spark's 1g default — under which
        # broadcast builds start failing once a long session (500-test
        # pytest run, 45-query bench) accumulates heap pressure
        # (notEnoughMemoryToBuildAndBroadcastTableError, observed r9).
        # Only effective at first JVM launch; a no-op on reuse, and on
        # a real cluster spark-submit's --driver-memory supersedes it.
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        # Catalyst / AQE: let the optimizer re-plan shuffles, coalesce
        # small partitions, and split skewed ones at runtime.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
        ),
        # Arrow everywhere Python touches rows (pandas UDFs, toPandas).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Determinism: timestamps are wall-clock-free and UTC.
        "spark.sql.session.timeZone": "UTC",
        # Parquet: push filters into the scan, millis timestamps on
        # write (parity with run_ccpyspark_job_hadoop.sh:79).
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MILLIS",
        # Serializer/codec profile from the reference submit script
        # (run_ccpyspark_job_hadoop.sh:63-79); harmless in local mode,
        # material on a cluster.
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.io.compression.codec": "zstd",
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
