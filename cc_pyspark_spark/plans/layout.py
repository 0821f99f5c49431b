"""Z-order layout quality — data-skipping envelopes per key range.

The query buckets lineitem rows by the top bits of their Morton key
(operators/layout.py:zorder_key over partkey/suppkey) and emits each
bucket's min/max envelope on BOTH dimensions plus its row count —
i.e. exactly the per-file statistics a z-ordered parquet write would
expose to scan pruning. Tight envelopes on every interleaved dimension
at once are the whole point of the layout; the oracle recomputes the
identical bit algebra in DuckDB, so the key definition itself is
hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc_pyspark_spark.catalog import Catalog
from cc_pyspark_spark.plans.registry import register

_ZBITS = 16  # bits per dimension kept in the Morton key
_ZBUCKETS = 64  # layout "files": equal key-range slices of [0, max zkey]


def _duck_zorder_oracle() -> str:
    x = f"(l_partkey % {1 << _ZBITS})"
    y = f"(l_suppkey % {1 << _ZBITS})"
    terms = []
    for i, c in enumerate((x, y)):
        terms.extend(
            f"((({c} >> {j}) & 1) << {j * 2 + i})" for j in range(_ZBITS)
        )
    zkey = " | ".join(terms)
    return f"""
WITH z AS (
  SELECT CAST({zkey} AS BIGINT) AS zkey,
         l_partkey AS pk, l_suppkey AS sk
  FROM lineitem
), mx AS (SELECT MAX(zkey) AS m FROM z)
SELECT CAST(zkey * {_ZBUCKETS} // (mx.m + 1) AS BIGINT) AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(MIN(pk) AS BIGINT) AS min_pk, CAST(MAX(pk) AS BIGINT) AS max_pk,
       CAST(MIN(sk) AS BIGINT) AS min_sk, CAST(MAX(sk) AS BIGINT) AS max_sk
FROM z CROSS JOIN mx GROUP BY 1
"""


@register(
    "layout_zorder_stats",
    oracle=_duck_zorder_oracle(),
    description="Z-order (Morton) layout for multi-dimension data "
    "skipping — the OPTIMIZE ZORDER BY primitive: partkey and suppkey "
    "bits interleave into one BIGINT key (pure shifts/masks/ORs, "
    "whole-stage codegen, no UDF), rows bucket into 64 equal key-range "
    "slices (scale-free: sliced against the in-plan max, a 1-row "
    "broadcast), and each bucket reports its min/max envelope on BOTH "
    "dimensions plus row count — exactly the per-file statistics a "
    "z-ordered repartitionByRange(zkey) parquet write exposes to scan "
    "pruning. "
    "At 100 TB this is one range shuffle at write time in exchange for "
    "min/max pruning on every interleaved column simultaneously",
    tags=("layout", "scale"),
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.layout import zorder_key  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    z = t.lineitem.select(
        zorder_key(
            [
                F.col("l_partkey") % (1 << _ZBITS),
                F.col("l_suppkey") % (1 << _ZBITS),
            ],
            bits=_ZBITS,
        ).alias("zkey"),
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
    )
    mx = z.agg(F.max("zkey").alias("m"))
    return (
        z.crossJoin(F.broadcast(mx))
        .groupBy(
            F.expr(f"(zkey * {_ZBUCKETS}) div (m + 1)")
            .cast("bigint")
            .alias("zbucket")
        )
        .agg(
            F.count("*").alias("cnt"),
            F.min("pk").cast("bigint").alias("min_pk"),
            F.max("pk").cast("bigint").alias("max_pk"),
            F.min("sk").cast("bigint").alias("min_sk"),
            F.max("sk").cast("bigint").alias("max_sk"),
        )
    )


#: Bucket count for the co-located join demo — matched on BOTH tables
#: (equal counts are what lets SMJ read buckets pairwise).
_N_BUCKETS = 8


@register(
    "layout_bucketed_join",
    oracle="""
SELECT c.c_mktsegment AS mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
""",
    description="Co-located join over BUCKETED managed tables (the "
    "pay-the-shuffle-once layout write_bucketed_table exists for): "
    "orders and customer are hash-bucketed 8-ways on custkey + "
    "bucket-sorted at WRITE time, so the custkey SortMergeJoin reads "
    "buckets pairwise with ZERO exchanges and zero sorts below it — "
    "the only Exchange in the whole plan is the final mktsegment agg "
    "(pinned in tests/test_plan_shape.py). Construction is eager (two "
    "bucketed writes into a per-sf_dir scratch location + catalog "
    "registration, overwrite-idempotent); the query half is the plan a "
    "100 TB deployment runs EVERY TIME against tables it bucketed "
    "once — where every tpch_* twin pays the custkey shuffle per run. "
    "Oracle joins the raw parquet: bucketing must never change results, "
    "only exchanges",
    tags=("layout", "join", "scale"),
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib  # noqa: PLC0415
    import os  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from cc_pyspark_spark.sources.tables import (  # noqa: PLC0415
        write_bucketed_table,
    )

    t = Catalog(spark, sf_dir)
    # Scratch location keyed by sf_dir so concurrent SFs never collide;
    # the catalog entry (in-memory per session) points at this path.
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    base = os.path.join(
        tempfile.gettempdir(), "ccps_bucketed", tag
    )
    names = {}
    for name, df, key in (
        ("orders", t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
         "o_custkey"),
        ("customer", t.customer.select("c_custkey", "c_mktsegment"),
         "c_custkey"),
    ):
        tbl = f"ccps_bkt_{name}_{tag}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        write_bucketed_table(
            df, tbl, key, num_buckets=_N_BUCKETS, sort_cols=key,
            path=os.path.join(base, name),
        )
        names[name] = tbl
    o = spark.table(names["orders"])
    c = spark.table(names["customer"])
    joined = o.hint("merge").join(
        c, o["o_custkey"] == c["c_custkey"]
    )
    return joined.groupBy(
        F.col("c_mktsegment").alias("mktsegment")
    ).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue"),
    )


def _source_fingerprint(path: str) -> str:
    """md5 over (relpath, size, mtime_ns) of every file under *path*.

    Keys the scratch layout on the CONTENT IDENTITY of the source, not
    just its path: regenerating the base dataset in place (re-running
    scripts/gen_scaled_sf.py into the same out_dir, rebuilding a
    testdata sf) changes mtimes/sizes, so the exists-skip below can
    never silently serve a partitioned copy of the OLD data while the
    oracle reads the new parquet (same hazard class as the
    _FIXTURE_VERSION guard in plans/warcq.py).
    """
    import hashlib  # noqa: PLC0415
    import os  # noqa: PLC0415

    h = hashlib.md5(os.path.abspath(path).encode())
    if os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                rel = os.path.relpath(os.path.join(root, f), path)
                h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
    elif os.path.exists(path):
        st = os.stat(path)
        h.update(f":{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:12]



#: Date slice for the pruning query: 3 of the corpus's 30 event days.
_PRUNE_LO, _PRUNE_HI = "2024-01-07", "2024-01-09"


@register(
    "layout_partition_pruning",
    oracle=f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '{_PRUNE_LO}' AND DATE '{_PRUNE_HI}'
GROUP BY 1
""",
    description="Hive-partitioned layout + partition pruning (the "
    "OTHER write-time layout next to bucketing and z-order): events "
    "are written partitionBy(event_date), so a date-sliced query "
    "prunes to 3 of 30 directories AT PLANNING TIME — the scan's "
    "PartitionFilters line (pinned in tests/test_plan_shape.py) shows "
    "the predicate applied to the directory listing, not the rows; "
    "27/30 of the data is never opened. At 100 TB with daily "
    "partitions this is the difference between reading 3 days and "
    "reading 3 years. Construction is eager (one partitioned write "
    "into a per-sf_dir scratch location, overwrite-idempotent); the "
    "oracle runs the same slice against the raw unpartitioned "
    "parquet — layout must never change results, only bytes read",
    tags=("layout", "events", "scale"),
)
def layout_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    import hashlib  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    source = os.path.join(sf_dir, "events.parquet")
    # Two-level scratch key (r14, ADVICE r13): <path-hash>/<content-tag>.
    # The content tag (sizes+mtimes) makes regeneration mint a fresh
    # copy; the PATH level scopes the stale-tag prune below to THIS
    # source only — distinct sf_dirs (pytest sf0.001, bench sf0.1, the
    # sf1 suite) hold distinct live tags concurrently, and alternating
    # between them must neither rebuild the copy each switch nor rmtree
    # a directory another run is actively reading.
    path_key = hashlib.md5(os.path.abspath(source).encode()).hexdigest()[:12]
    tag = _source_fingerprint(source)
    root = os.path.join(tempfile.gettempdir(), "ccps_partitioned", path_key)
    base = os.path.join(root, tag, "events")
    marker = os.path.join(base, "_SUCCESS")
    if not os.path.exists(marker):
        # Prune stale content-tags of the SAME source before writing so
        # repeated regenerations never accumulate dead partitioned
        # copies (r12 ADVICE). Safe within a path_key: a sibling tag
        # here describes a prior state of this exact source path, which
        # no longer exists on disk.
        import shutil  # noqa: PLC0415

        if os.path.isdir(root):
            for old in os.listdir(root):
                if old != tag:
                    shutil.rmtree(os.path.join(root, old), ignore_errors=True)
        # One-time migration (r15, ADVICE r14): pre-r14 scratch copies
        # were keyed <content-tag> directly under ccps_partitioned/
        # (no path_key level), so the path-key-scoped prune above never
        # reaches them and they'd persist in tmp indefinitely. Both
        # levels are 12-hex md5 prefixes, so the NAME can't tell a
        # stale pre-r14 tag dir from a sibling source's live path_key
        # dir — the STRUCTURE can: a pre-r14 tag dir holds the dataset
        # dir (events/) directly, a path_key dir holds tag SUBDIRS.
        # Remove only top-level dirs whose immediate child is a
        # dataset directory with a write marker; anything else (live
        # path_keys of other sources, unknown layouts) survives.
        top = os.path.dirname(root)
        if os.path.isdir(top):
            for old in os.listdir(top):
                old_path = os.path.join(top, old)
                if old_path != root and os.path.exists(
                    os.path.join(old_path, "events", "_SUCCESS")
                ):
                    shutil.rmtree(old_path, ignore_errors=True)
        (
            t.events.withColumn("event_date", F.to_date("ts"))
            .repartition("event_date")
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(base)
        )
    ev = spark.read.parquet(base)
    return (
        ev.filter(
            F.col("event_date").between(
                F.lit(_PRUNE_LO).cast("date"), F.lit(_PRUNE_HI).cast("date")
            )
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "layout_bucketed_agg",
    oracle="""
SELECT o_custkey AS custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         AS revenue
FROM orders
GROUP BY 1
""",
    description="Bucket-key aggregation over the bucketed managed "
    "table (the OTHER half of the pay-the-shuffle-once claim next to "
    "layout_bucketed_join): a groupBy on the bucket key reads each "
    "bucket as an already-partitioned group, so the aggregate runs "
    "with ZERO exchanges in the whole plan (pinned in "
    "tests/test_plan_shape.py) — at 100 TB every per-customer rollup "
    "against the bucketed layout is a map-only pass where the "
    "unbucketed twin pays a full shuffle per run. Construction reuses "
    "the same per-sf_dir scratch tables the join query writes "
    "(overwrite-idempotent); oracle aggregates the raw parquet — "
    "layout must never change results",
    tags=("layout", "scale"),
)
def layout_bucketed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib  # noqa: PLC0415
    import os  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from cc_pyspark_spark.sources.tables import (  # noqa: PLC0415
        write_bucketed_table,
    )

    t = Catalog(spark, sf_dir)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = f"ccps_bkt_orders_{tag}"
    try:
        have = spark.catalog.tableExists(tbl)
    except Exception:  # noqa: BLE001
        have = False
    if not have:
        base = os.path.join(tempfile.gettempdir(), "ccps_bucketed", tag)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        write_bucketed_table(
            t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
            tbl,
            "o_custkey",
            num_buckets=_N_BUCKETS,
            sort_cols="o_custkey",
            path=os.path.join(base, "orders"),
        )
    return (
        spark.table(tbl)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )
