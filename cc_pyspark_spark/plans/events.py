"""Time-window aggregations over the `events` table (batch mode).

The reference is batch-only (SURVEY.md §2.9): these are the
beyond-reference time-series operators, expressed with Spark's
`window()` / `session_window()` in batch mode. The same expressions run
under Structured Streaming with a watermark (see streaming/).

Window starts are emitted as epoch seconds (BIGINT) so the hash compare
is immune to cross-engine timestamp rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cc_pyspark_spark.catalog import Catalog
from cc_pyspark_spark.plans.registry import register

def _dsum_value() -> F.Column:
    return (
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value")
    )


@register(
    "events_tumbling_hourly",
    oracle="""
SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    description="Tumbling 1h window agg — window() in batch (epoch-aligned, "
    "matches date_trunc)",
    tags=("events", "window", "bench"),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), _dsum_value())
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "events_sliding_10m_5m",
    oracle="""
WITH expanded AS (
  SELECT CAST(floor(epoch(ts) / 300) * 300 - k.k * 300 AS BIGINT) AS window_start,
         value
  FROM events, (SELECT unnest([0, 1]) AS k) k
)
SELECT window_start,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM expanded
GROUP BY 1
""",
    description="Sliding window (10 min length, 5 min slide): each event in "
    "exactly 2 overlapping windows",
    tags=("events", "window"),
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.count("*").alias("n"), _dsum_value())
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "n",
            "sum_value",
        )
    )


@register(
    "events_session_window",
    oracle="""
WITH o AS (
  SELECT user_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), marked AS (
  SELECT user_id, ts, value,
         CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM o
), sessions AS (
  SELECT user_id, ts, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, sid
""",
    description="Session window (30 min gap) per user — session_window() in "
    "batch; oracle is the gaps-and-islands formulation",
    tags=("events", "window", "bench"),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return (
        t.events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"), _dsum_value())
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_asof_join",
    oracle="""
WITH ordered AS (
  SELECT event_id, user_id, ts, event_type, value,
         MAX(CASE WHEN event_type = 'click' THEN event_id END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           IS NOT NULL AS has_prior,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id
  FROM events
)
SELECT event_id AS purchase_id, user_id, click_id
FROM ordered
WHERE event_type = 'purchase' AND click_id IS NOT NULL
""",
    description="As-of join (custom operator as composition, SURVEY §2.3 "
    "'not present'): each purchase matched to the user's most recent prior "
    "click via an IGNORE NULLS window — no pairwise join, one shuffle by user",
    tags=("events", "join"),
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    click_id = F.last(
        F.when(F.col("event_type") == "click", F.col("event_id")), ignorenulls=True
    ).over(w)
    return (
        t.events.withColumn("click_id", click_id)
        .filter((F.col("event_type") == "purchase") & F.col("click_id").isNotNull())
        .select(F.col("event_id").alias("purchase_id"), "user_id", "click_id")
    )


@register(
    "events_range_join",
    oracle="""
SELECT p.event_id AS purchase_id,
       COUNT(c.event_id) AS n_recent_clicks
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 10 MINUTE
 AND c.ts < p.ts
GROUP BY p.event_id
""",
    description="Range join (equi on user + ts interval band): clicks in the "
    "10 minutes before each purchase — the band predicate rides on the "
    "user_id equi-join, so the shuffle is by user, never a cross product",
    tags=("events", "join"),
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    p = t.events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = t.events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTE"))
        & (F.col("c_ts") < F.col("p_ts")),
        "left",
    )
    return joined.groupBy("purchase_id").agg(
        F.count("click_id").alias("n_recent_clicks")
    )


@register(
    "events_user_trend",
    oracle="""
WITH b AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS x,
         value AS y
  FROM events
), sums AS (
  SELECT user_id,
         COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(12,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(12,0)) * CAST(x AS DECIMAL(12,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x AS DECIMAL(12,0)) * CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sxy
  FROM b GROUP BY user_id
)
SELECT user_id, n,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
FROM sums
""",
    description="Per-user linear trend of event values over time: "
    "closed-form least squares from decimal-exact sums (custom analytic "
    "without any UDF; U3-class aggregation as plain algebra)",
    tags=("events", "agg"),
)
def events_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    b = t.events.select(
        "user_id",
        (F.unix_timestamp("ts") - F.lit(1704067200)).alias("x"),
        F.col("value").alias("y"),
    )
    xd = F.col("x").cast("decimal(12,0)")
    yd = F.col("y").cast("decimal(18,6)")
    sums = b.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(xd * yd).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select("user_id", "n", slope.alias("slope"))


@register(
    "window_range_frame",
    oracle="""
WITH b AS (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS x,
         value
  FROM events
)
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6)))
            OVER (PARTITION BY user_id ORDER BY x
                  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS sum_10m,
       CAST(COUNT(*)
            OVER (PARTITION BY user_id ORDER BY x
                  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_10m
FROM b
""",
    description="RANGE window frame (value-based, not row-based): rolling "
    "10-minute sum/count per user over epoch seconds — the frame spec class "
    "SURVEY §2.5 notes as absent from the reference",
    tags=("events", "window"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    b = t.events.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("x"),
        "value",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("x")
        .rangeBetween(-600, W.currentRow)
    )
    return b.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sum_10m"),
        F.count("*").over(w).cast("bigint").alias("n_10m"),
    )


@register(
    "events_hypertable_rollup",
    oracle="""
WITH m AS (
  SELECT CAST(floor(epoch(date_trunc('minute', ts))) AS BIGINT) AS bucket_start,
         event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS s
  FROM events GROUP BY 1, 2
)
SELECT '1m' AS resolution, bucket_start, event_type, n,
       CAST(s AS DOUBLE) AS sum_value
FROM m
UNION ALL
SELECT '1h', CAST(bucket_start // 3600 * 3600 AS BIGINT), event_type,
       CAST(SUM(n) AS BIGINT), CAST(SUM(s) AS DOUBLE)
FROM m GROUP BY 2, 3
UNION ALL
SELECT '1d', CAST(bucket_start // 86400 * 86400 AS BIGINT), event_type,
       CAST(SUM(n) AS BIGINT), CAST(SUM(s) AS DOUBLE)
FROM m GROUP BY 2, 3
""",
    description="Hypertable-style multi-resolution rollup (beyond-reference, "
    "TimescaleDB continuous-aggregate shape): the minute grain is aggregated "
    "ONCE from raw events; hour and day grains re-aggregate the minute "
    "rollup, never the raw table. Counts and exact DECIMAL sums are "
    "re-aggregable monoids, so the hierarchy is bit-identical to direct "
    "grouping — the oracle's coarse grains likewise fold the minute CTE. "
    "At 100 TB each grain is a stored table refreshed incrementally; here "
    "the three grains share one scan via Spark exchange reuse (plan-pinned)",
    tags=("events", "window", "rollup"),
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    minute = (
        t.events.groupBy(
            F.unix_timestamp(F.date_trunc("minute", F.col("ts"))).alias(
                "bucket_start"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
        )
    )

    def _coarsen(df: DataFrame, seconds: int, tag: str) -> DataFrame:
        return (
            df.groupBy(
                (F.col("bucket_start") - F.col("bucket_start") % seconds).alias(
                    "bucket_start"
                ),
                "event_type",
            )
            .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
            .select(
                F.lit(tag).alias("resolution"),
                "bucket_start",
                "event_type",
                "n",
                F.col("s").cast("double").alias("sum_value"),
            )
        )

    fine = minute.select(
        F.lit("1m").alias("resolution"),
        "bucket_start",
        "event_type",
        "n",
        F.col("s").cast("double").alias("sum_value"),
    )
    hour = _coarsen(minute, 3600, "1h")
    day = _coarsen(minute, 86400, "1d")
    return fine.unionByName(hour).unionByName(day)


@register(
    "events_gapfill_locf",
    oracle="""
WITH m AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_start,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, MIN(bucket_start) AS lo, MAX(bucket_start) AS hi
  FROM m GROUP BY 1
), grid AS (
  SELECT b.event_type, g.g AS bucket_start
  FROM bounds b, unnest(range(b.lo, b.hi + 3600, 3600)) AS g(g)
), joined AS (
  SELECT g.event_type, g.bucket_start,
         COALESCE(m.n, 0) AS n,
         m.sum_value,
         CASE WHEN m.n IS NULL THEN TRUE ELSE FALSE END AS filled
  FROM grid g LEFT JOIN m USING (event_type, bucket_start)
)
SELECT event_type, bucket_start, n,
       COALESCE(sum_value,
                LAST_VALUE(sum_value IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY bucket_start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         AS sum_value_locf,
       filled
FROM joined
""",
    description="Time-series gap filling (beyond-reference, the hypertable "
    "rollup's companion): a dense per-type hourly grid is generated with "
    "sequence()/explode between each series' observed bounds, left-joined "
    "to the hourly rollup; missing buckets get n=0 and "
    "last-observation-carried-forward values via last(ignoreNulls) over an "
    "unbounded-preceding window. Grid generation is O(span/60) rows per "
    "type — no driver loop; at 100 TB the grid explodes from a tiny "
    "bounds table, never from raw data",
    tags=("events", "window", "rollup"),
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    m = (
        t.events.groupBy(
            "event_type",
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias(
                "bucket_start"
            ),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    bounds = m.groupBy("event_type").agg(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("bucket_start"),
    )
    joined = grid.join(m, ["event_type", "bucket_start"], "left").select(
        "event_type",
        "bucket_start",
        F.coalesce("n", F.lit(0)).alias("n"),
        "sum_value",
        F.col("n").isNull().alias("filled"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket_start")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return joined.select(
        "event_type",
        "bucket_start",
        "n",
        F.coalesce(
            "sum_value", F.last("sum_value", ignorenulls=True).over(w)
        ).alias("sum_value_locf"),
        "filled",
    )


@register(
    "events_funnel_conversion",
    oracle="""
WITH fc AS (
  SELECT user_id, MIN(ts) AS click_ts FROM events
  WHERE event_type = 'click' GROUP BY 1
), conv AS (
  SELECT fc.user_id, fc.click_ts,
         MIN(e.ts) AS purchase_ts
  FROM fc LEFT JOIN events e
    ON e.user_id = fc.user_id
   AND e.event_type = 'purchase'
   AND e.ts > fc.click_ts
   AND e.ts <= fc.click_ts + INTERVAL 30 MINUTE
  GROUP BY 1, 2
)
SELECT CAST(floor(epoch(date_trunc('hour', click_ts))) AS BIGINT) AS cohort_hour,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN purchase_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted
FROM conv GROUP BY 1
""",
    description="Funnel conversion (beyond-reference event analytics): per "
    "user, first click -> earliest purchase within 30 minutes; conversion "
    "counts by first-click hour cohort. Two hash aggregations and one "
    "time-banded left join keyed by user_id — the as-of/range-join family "
    "shape, all integers, fully hash-checked",
    tags=("events", "analytics"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    fc = (
        t.events.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = t.events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        fc.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("click_ts"))
            & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTE")),
            "left",
        )
        .groupBy("user_id", "click_ts")
        .agg(F.min("p_ts").alias("purchase_ts"))
    )
    return (
        conv.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("click_ts"))).alias(
                "cohort_hour"
            )
        )
        .agg(
            F.count("*").alias("n_users"),
            F.sum(
                F.when(F.col("purchase_ts").isNotNull(), 1).otherwise(0)
            ).alias("n_converted"),
        )
    )


@register(
    "events_retention_cohorts",
    oracle="""
WITH fs AS (
  -- floor to integer seconds BEFORE the day division: epoch() is a
  -- DOUBLE and double '//' does not floor in DuckDB
  SELECT user_id,
         MIN(CAST(floor(epoch(ts)) AS BIGINT)) // 86400 AS cohort_day
  FROM events GROUP BY 1
), act AS (
  SELECT DISTINCT e.user_id,
         CAST(floor(epoch(e.ts)) AS BIGINT) // 86400 AS day
  FROM events e
)
SELECT fs.cohort_day,
       CAST(act.day - fs.cohort_day AS BIGINT) AS day_offset,
       CAST(COUNT(DISTINCT fs.user_id) AS BIGINT) AS n_active
FROM fs JOIN act ON act.user_id = fs.user_id
WHERE act.day - fs.cohort_day <= 7
GROUP BY 1, 2
""",
    description="Cohort retention (beyond-reference event analytics): users "
    "bucketed by first-seen day, activity counted at day offsets 0..7 — "
    "the standard DAU retention triangle. One distinct-activity "
    "aggregation + one join keyed by user_id; integers only",
    tags=("events", "analytics"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    fs = t.events.groupBy("user_id").agg(
        F.min(F.unix_timestamp("ts")).alias("first_ts")
    ).select(
        "user_id", F.expr("first_ts div 86400").alias("cohort_day")
    )
    act = t.events.select(
        "user_id", F.expr("unix_timestamp(ts) div 86400").alias("day")
    ).distinct()
    return (
        fs.join(act, "user_id")
        .filter(F.col("day") - F.col("cohort_day") <= 7)
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "events_rolling_zscore",
    oracle="""
WITH w AS (
  SELECT event_id, user_id, ts, value,
         COUNT(*) OVER win AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER win AS DOUBLE) AS sx,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
              OVER win AS DOUBLE) AS sxx
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT event_id,
       CASE WHEN n >= 5 AND sxx / n - (sx / n) * (sx / n) > 0
            THEN (value - sx / n) / sqrt(sxx / n - (sx / n) * (sx / n))
       END AS z,
       CAST(n AS BIGINT) AS n_window,
       COALESCE(
         CASE WHEN n >= 5 AND sxx / n - (sx / n) * (sx / n) > 0
              THEN abs((value - sx / n)
                       / sqrt(sxx / n - (sx / n) * (sx / n))) > 2.0
         END, FALSE) AS is_anomaly
FROM w
""",
    description="Rolling z-score anomaly flags (beyond-reference "
    "time-series): per user, mean/std over the trailing 10 events "
    "(population moments from EXACT decimal window sums — a double "
    "moving-sum would hang on the window implementation's association "
    "order; DECIMAL is associative so both engines agree bit-for-bit), "
    "z of the current value, |z| > 2 flag once 5+ points exist. "
    "One shuffle keyed by user; sqrt and division are IEEE-exact",
    tags=("events", "window", "quality"),
)
def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    win = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, W.currentRow)
    )
    dec = F.col("value").cast("decimal(18,6)")
    base = t.events.select(
        "event_id",
        "value",
        F.count("*").over(win).alias("n"),
        F.sum(dec).over(win).cast("double").alias("sx"),
        F.sum(dec * dec).over(win).cast("double").alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    var = F.col("sxx") / F.col("n") - mean * mean
    z = F.when(
        (F.col("n") >= 5) & (var > 0), (F.col("value") - mean) / F.sqrt(var)
    )
    return base.select(
        "event_id",
        z.alias("z"),
        F.col("n").cast("bigint").alias("n_window"),
        F.coalesce(F.abs(z) > 2.0, F.lit(False)).alias("is_anomaly"),
    )


@register(
    "events_ks_drift",
    oracle="""
WITH va AS (
  SELECT value AS v, CAST(COUNT(*) AS BIGINT) AS ca
  FROM events WHERE event_type = 'click' AND value IS NOT NULL
  GROUP BY value
), vb AS (
  SELECT value AS v, CAST(COUNT(*) AS BIGINT) AS cb
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY value
), m AS (
  SELECT COALESCE(va.v, vb.v) AS v,
         COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
  FROM va FULL OUTER JOIN vb ON va.v = vb.v
), c AS (
  SELECT v,
         CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS ia,
         CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS jb
  FROM m
), t AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n, CAST(SUM(cb) AS BIGINT) AS mm FROM m
), d AS (
  SELECT v, CAST(ABS(ia * t.mm - jb * t.n) AS BIGINT) AS d_num, t.n, t.mm
  FROM c CROSS JOIN t
)
SELECT v AS at_value, d_num, n, mm AS m,
       CAST(d_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(mm AS DOUBLE)) AS ks
FROM d ORDER BY d_num DESC, at_value DESC LIMIT 1
""",
    description="Exact two-sample Kolmogorov-Smirnov drift statistic "
    "between the click and purchase value distributions — the "
    "distribution-shift monitor a training-data pipeline runs between "
    "crawl snapshots, computed in pure INTEGER arithmetic: the sup of "
    "|F_a - F_b| equals max|i*m - j*n|/(n*m), so cumulative counts i, j "
    "ride a window-free range-partitioned prefix sum "
    "(operators/ids.py:range_prefix_sums — no single-partition window, "
    "the 100 TB discipline) and the max is an associative integer "
    "aggregate; the one double division happens once, on the final row. "
    "Integer products stay exact to ~3e9 rows per sample; past that, "
    "swap the numerator to DECIMAL(38,0) (documented in SCALING.md). "
    "PRECONDITION: NULL values are excluded in BOTH engines before "
    "the prefix sum — range_prefix_sums requires a unique non-null "
    "order key, and Spark sorts NULLs first where DuckDB's "
    "SUM() OVER (ORDER BY v) sorts them last (a sample with NULLs "
    "would otherwise silently break engine parity); dropping NULLs "
    "is also the right KS semantics (the EDF is over observed "
    "values)",
    tags=("events", "scale"),
)
def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.ids import range_prefix_sums  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    va = (
        t.events.filter(
            (F.col("event_type") == "click") & F.col("value").isNotNull()
        )
        .groupBy(F.col("value").alias("v"))
        .agg(F.count("*").alias("ca"))
    )
    vb = (
        t.events.filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .groupBy(F.col("value").alias("v"))
        .agg(F.count("*").alias("cb"))
    )
    m = (
        va.join(vb, "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    cums = range_prefix_sums(m, ["v"], ["ca", "cb"])
    tot = m.agg(
        F.sum("ca").cast("bigint").alias("n"),
        F.sum("cb").cast("bigint").alias("mm"),
    )
    d = cums.crossJoin(F.broadcast(tot)).select(
        "v",
        F.abs(
            F.col("cum_ca") * F.col("mm") - F.col("cum_cb") * F.col("n")
        ).cast("bigint").alias("d_num"),
        "n",
        "mm",
    )
    # argmax as a max-struct aggregate (associative, no global sort);
    # (d_num, v) lexicographic max == ORDER BY d_num DESC, v DESC LIMIT 1
    mx = d.agg(F.max(F.struct("d_num", "v", "n", "mm")).alias("x"))
    return mx.select(
        F.col("x.v").alias("at_value"),
        F.col("x.d_num").alias("d_num"),
        F.col("x.n").alias("n"),
        F.col("x.mm").alias("m"),
        (
            F.col("x.d_num").cast("double")
            / (F.col("x.n").cast("double") * F.col("x.mm").cast("double"))
        ).alias("ks"),
    )


@register(
    "events_cusum_changepoint",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS x
  FROM events WHERE event_type = 'error' GROUP BY 1
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(x) AS BIGINT) AS total
  FROM hourly
), dev AS (
  SELECT hour, t.m, t.total, t.m * x - t.total AS d
  FROM hourly CROSS JOIN t
), scans AS (
  SELECT hour, m, total,
         CAST(SUM(d) OVER (ORDER BY hour) AS BIGINT) AS p
  FROM dev
), s AS (
  -- LEAST with 0: the empty prefix P_0 = 0 is a valid CUSUM reset
  -- point (an all-positive initial run must score P_i, not 0)
  SELECT hour, m, total,
         p - LEAST(CAST(0 AS BIGINT), MIN(p) OVER (ORDER BY hour)) AS s_num
  FROM scans
)
SELECT hour AS at_hour, CAST(s_num AS BIGINT) AS s_num, m, total,
       CAST(s_num AS DOUBLE) / CAST(m AS DOUBLE) AS cusum
FROM s ORDER BY s_num DESC, at_hour DESC LIMIT 1
""",
    description="CUSUM changepoint score over the hourly error-event "
    "rate — the third leg of the drift-monitoring family (chi-square "
    "composition shift, KS distribution shift, CUSUM level shift): the "
    "classic sequential statistic max_i(P_i - min_{j<=i} P_j) over "
    "deviations from the mean rate, rewritten as prefix-sum minus "
    "running-minimum so the inherently sequential recursion becomes two "
    "associative scans on operators/ids.py:range_prefix_scan (the "
    "generalized sum/min/max distributed scan — NO single-partition "
    "window). Deviations are pre-scaled by the hour count (d = m*x - "
    "total), so everything is exact BIGINT until one final double "
    "division; argmax by deterministic (score, hour) max-struct",
    tags=("events", "scale"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.ids import range_prefix_scan  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    hourly = (
        t.events.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("x"))
    )
    tot = hourly.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("total"),
    )
    dev = hourly.crossJoin(F.broadcast(tot)).select(
        "hour", "m", "total", (F.col("m") * F.col("x") - F.col("total")).alias("d")
    )
    p = range_prefix_scan(dev, ["hour"], [("d", "sum")]).withColumnRenamed(
        "scan_sum_d", "p"
    )
    s = range_prefix_scan(p, ["hour"], [("p", "min")]).select(
        "hour",
        "m",
        "total",
        # least with 0: the empty prefix P_0 = 0 is a valid reset point
        (
            F.col("p") - F.least(F.lit(0).cast("bigint"), F.col("scan_min_p"))
        ).cast("bigint").alias("s_num"),
    )
    mx = s.agg(F.max(F.struct("s_num", "hour", "m", "total")).alias("x"))
    return mx.select(
        F.col("x.hour").alias("at_hour"),
        F.col("x.s_num").alias("s_num"),
        F.col("x.m").alias("m"),
        F.col("x.total").alias("total"),
        (F.col("x.s_num").cast("double") / F.col("x.m").cast("double")).alias(
            "cusum"
        ),
    )


@register(
    "events_scd2_asof",
    oracle="""
WITH p AS (
  SELECT user_id, ts, event_id,
         LEAST(3, CAST(FLOOR(value / 50) AS BIGINT)) AS tier
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts, event_id, tier,
         CASE WHEN LAG(tier) OVER w IS NULL
                OR LAG(tier) OVER w <> tier THEN 1 ELSE 0 END AS chg
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT user_id, ts, tier, chg,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM c
), iv AS (
  SELECT user_id, grp, MIN(tier) AS tier, MIN(ts) AS valid_from
  FROM g GROUP BY 1, 2
), scd AS (
  SELECT user_id, tier, valid_from,
         LEAD(valid_from) OVER (PARTITION BY user_id
                                ORDER BY valid_from, grp) AS valid_to
  FROM iv
)
SELECT scd.tier,
       CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(f.value AS DECIMAL(18,6))) AS DOUBLE) AS click_value
FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'click') f
JOIN scd ON f.user_id = scd.user_id AND f.ts >= scd.valid_from
        AND (scd.valid_to IS NULL OR f.ts < scd.valid_to)
GROUP BY 1
""",
    description="SCD2 dimension build + temporal fact join (the "
    "warehouse pattern Spark has no primitive for, as composition): "
    "purchase events define a per-user tier attribute; gaps-and-islands "
    "(lag-change flag -> running-sum group id, both over ONE "
    "(user, ts, event_id) window ordering) collapses consecutive "
    "same-tier runs into SCD2 validity intervals [valid_from, "
    "valid_to); clicks then join to the interval covering their "
    "timestamp. Interval tie-break: two intervals sharing valid_from "
    "(equal-ts purchases) order by group id, so the earlier run gets "
    "an empty [t, t) interval that matches nothing — deterministic in "
    "both engines. Plan: the two windows and the island agg SHARE the "
    "user_id partition key (one Exchange, three in-partition sorts); "
    "the fact join is user_id-keyed equi + range residual, so SMJ "
    "co-partitions both sides — never a pairwise time crossjoin. At "
    "100 TB the dimension frame is tiny next to facts; clicks shuffle "
    "once by user_id",
    tags=("events", "join", "window"),
)
def events_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    tier = F.least(
        F.lit(3), F.floor(F.col("value") / 50).cast("bigint")
    ).cast("bigint")
    p = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", tier.alias("tier")
    )
    w1 = W.partitionBy("user_id").orderBy("ts", "event_id")
    lag_tier = F.lag("tier").over(w1)
    chg = F.when(
        lag_tier.isNull() | (lag_tier != F.col("tier")), 1
    ).otherwise(0)
    g = p.withColumn("chg", chg).withColumn(
        "grp",
        F.sum("chg").over(w1.rowsBetween(W.unboundedPreceding, 0)),
    )
    iv = g.groupBy("user_id", "grp").agg(
        F.min("tier").alias("tier"), F.min("ts").alias("valid_from")
    )
    w2 = W.partitionBy("user_id").orderBy("valid_from", "grp")
    scd = iv.select(
        "user_id",
        "tier",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
    # Both frames descend from the same events scan, so disambiguate
    # with explicit aliases (df["col"] against shared lineage emits a
    # trivially-true-predicate warning and relies on dataset-id
    # resolution; alias-qualified names are unambiguous).
    f = (
        t.events.filter(F.col("event_type") == "click")
        .select("user_id", "ts", "value")
        .alias("f")
    )
    joined = f.join(
        scd.alias("scd"),
        (F.col("f.user_id") == F.col("scd.user_id"))
        & (F.col("f.ts") >= F.col("scd.valid_from"))
        & (
            F.col("scd.valid_to").isNull()
            | (F.col("f.ts") < F.col("scd.valid_to"))
        ),
    )
    return joined.groupBy("tier").agg(
        F.count("*").cast("bigint").alias("n_clicks"),
        F.countDistinct("f.user_id").cast("bigint").alias("n_users"),
        F.sum(F.col("f.value").cast("decimal(18,6)"))
        .cast("double")
        .alias("click_value"),
    )


@register(
    "events_ohlc_bars",
    oracle="""
SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       (MIN({'ts': ts, 'event_id': event_id, 'value': value})).value AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       (MAX({'ts': ts, 'event_id': event_id, 'value': value})).value AS close,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    description="OHLC bars (the canonical time-series downsample: "
    "open/high/low/close + volume per hour per event_type). "
    "First/last are TIE-DETERMINISTIC: open/close come from a "
    "struct-min/max over (ts, event_id, value) — lexicographic struct "
    "comparison IS the total order, so equal-timestamp events resolve "
    "by event_id identically in both engines (Spark's min_by/first "
    "make no such promise; the oracle replays the same order via "
    "arg_min over a (ts, event_id) tuple). high/low/count/sum are "
    "plain exact aggregates (decimal sum -> double, no float fold). "
    "Plan: ONE hash aggregate keyed by (hour, event_type), partial "
    "combines map-side — downsampling 100 TB of ticks is a single "
    "shuffle of one row per (bar, type) per map partition",
    tags=("events", "window"),
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    key = F.struct("ts", "event_id", "value")
    return (
        t.events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min(key).getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(key).getField("value").alias("close"),
            _dsum_value(),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n",
            "open",
            "high",
            "low",
            "close",
            "sum_value",
        )
    )


@register(
    "events_interval_overlap",
    oracle="""
WITH iv AS (
  SELECT user_id, event_id, ts,
         ts + INTERVAL (CAST(FLOOR(value) AS INTEGER)) MINUTE AS te
  FROM events WHERE event_type = 'purchase'
)
SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id,
       epoch_us(LEAST(a.te, b.te)) - epoch_us(GREATEST(a.ts, b.ts))
         AS overlap_us
FROM iv a JOIN iv b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND a.ts < b.te AND b.ts < a.te
""",
    description="Interval-overlap self-join (the operator Spark has no "
    "primitive for, as a BUCKETED composition): purchase events define "
    "half-open activity intervals [ts, ts + floor(value) minutes); "
    "report every overlapping same-user pair with the exact overlap "
    "in integer MICROSECONDS (epoch_us algebra — no float time math). "
    "Plan: each interval explodes to its covered hour buckets "
    "(<= 8 here, bounded by max duration / bucket width), candidates "
    "join on (user_id, hour_bucket) EQUI keys — never a per-user "
    "theta join — then the exact overlap predicate filters and a "
    "dropDuplicates collapses pairs sharing several buckets. At "
    "100 TB the bucket width is the knob: replication factor "
    "(duration/width) against per-bucket candidate count — the same "
    "trade as the LSH band count. Oracle is the direct theta range "
    "join DuckDB can afford at fixture scale",
    tags=("events", "join", "scale"),
)
def events_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    iv = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        "ts",
        F.expr(
            "ts + make_dt_interval(0, 0, CAST(FLOOR(value) AS INT), 0)"
        ).alias("te"),
    )
    # floor to hour indexes FIRST so buckets align (sequence() over
    # fractional doubles would step from a fractional start).
    binned = iv.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(
                    F.unix_timestamp(F.col("ts").cast("timestamp_ltz"))
                    / 3600
                ).cast("bigint"),
                F.floor(
                    F.unix_timestamp(F.col("te").cast("timestamp_ltz"))
                    / 3600
                ).cast("bigint"),
            )
        ),
    )
    a = binned.alias("a")
    b = binned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .filter(
            (F.col("a.ts") < F.col("b.te")) & (F.col("b.ts") < F.col("a.te"))
        )
        .select(
            F.col("a.event_id").alias("a_id"),
            F.col("b.event_id").alias("b_id"),
            F.col("a.user_id").alias("user_id"),
            # ts arrives TIMESTAMP_NTZ in a vanilla session; cast to
            # LTZ for unix_micros — the tz offset cancels in the
            # difference, so overlap_us is timezone-independent.
            (
                F.unix_micros(
                    F.least(F.col("a.te"), F.col("b.te")).cast(
                        "timestamp_ltz"
                    )
                )
                - F.unix_micros(
                    F.greatest(F.col("a.ts"), F.col("b.ts")).cast(
                        "timestamp_ltz"
                    )
                )
            ).alias("overlap_us"),
        )
    )
    return pairs.dropDuplicates(["a_id", "b_id"])
