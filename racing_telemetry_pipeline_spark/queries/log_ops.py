"""Log-pipeline operator queries over the ``events`` table.

``events(event_id, ts, user_id, event_type, value, props)`` is the
testdata analog of the transcript table: ``user_id`` plays conv_id,
``event_id`` is the ingest ordinal, ``props`` is the grok-parse target.
Each query re-expresses one operator family from SURVEY.md §2 (reference
file:line cited per query) as a (PySpark DataFrame, DuckDB oracle SQL)
pair with identical column names/rounding.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import dsum, dsum_sql, t

K_PATTERN = r'"k": (\d+)'


# --- P1: regex field extraction (grok parse) ------------------------------
# ref: vehicle-identity regex /root/reference/src/schemas/raw.py:21-44
def p1_regex_parse(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    k = F.regexp_extract("props", K_PATTERN, 1)
    return (
        ev.withColumn("k", F.when(k == "", None).otherwise(k).cast("long"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k").alias("n_parsed"),
            F.sum("k").alias("sum_k"),
        )
    )


P1_SQL = f"""
SELECT event_type, count(*) AS n, count(k) AS n_parsed,
       cast(sum(k) AS bigint) AS sum_k
FROM (SELECT event_type,
             try_cast(regexp_extract(props, '{K_PATTERN}', 1) AS bigint) AS k
      FROM events)
GROUP BY event_type
"""


# --- D1/W13: keep-last dedup by ingest ordinal ----------------------------
# ref: /root/reference/src/ingestion/anomalies.py:39-95
def d1_dedup_keep_last(spark, sf_dir):
    ev = t(spark, sf_dir, "events").withColumn(
        "minute", F.date_trunc("minute", F.col("ts"))
    )
    w = Window.partitionBy("user_id", "event_type", "minute").orderBy(
        F.col("event_id").desc()
    )
    kept = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return kept.groupBy("user_id").agg(
        F.count("*").alias("n_kept"),
        F.max("event_id").alias("last_event_id"),
    )


D1_SQL = """
SELECT user_id, count(*) AS n_kept, max(event_id) AS last_event_id
FROM (
  SELECT * FROM events
  QUALIFY row_number() OVER (
    PARTITION BY user_id, event_type, date_trunc('minute', ts)
    ORDER BY event_id DESC) = 1
)
GROUP BY user_id
"""


# --- W1/W4/W11: backwards detection + monotonic repair --------------------
# ref: /root/reference/src/utils/time_utils.py:69-90,
#      /root/reference/src/transform/time_sync.py:241-249
def w1_monotonic_repair(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("ts_sync", F.max("ts").over(run))
        .withColumn(
            "is_backwards",
            F.coalesce(F.col("ts") < F.col("prev_ts"), F.lit(False)),
        )
    )
    return df.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("is_backwards").cast("int")).alias("n_backwards"),
        F.sum((F.col("ts_sync") != F.col("ts")).cast("int")).alias("n_repaired"),
        F.max("ts_sync").alias("max_ts_sync"),
    )


W1_SQL = """
SELECT user_id, count(*) AS n_events,
       cast(sum(CASE WHEN is_backwards THEN 1 ELSE 0 END) AS bigint) AS n_backwards,
       cast(sum(CASE WHEN ts_sync <> ts THEN 1 ELSE 0 END) AS bigint) AS n_repaired,
       max(ts_sync) AS max_ts_sync
FROM (
  SELECT user_id, ts,
         coalesce(ts < lag(ts) OVER w, false) AS is_backwards,
         max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ts_sync
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
)
GROUP BY user_id
"""


# --- W2/W3: gap detection + segment ids ------------------------------------
# ref: /root/reference/src/utils/time_utils.py:93-153
GAP_SEC = 3600


def w2_gaps_segments(spark, sf_dir):
    # gaps measured in exact microseconds: Spark timestampdiff(SECOND)
    # floors elapsed time while DuckDB date_diff('second') counts boundary
    # crossings — at MICROSECOND granularity both are the exact difference
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    df = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("gap_us", gap)
        .withColumn(
            "is_gap",
            F.coalesce(F.col("gap_us") > GAP_SEC * 1_000_000, F.lit(False)),
        )
        .withColumn("segment_id", F.sum(F.col("is_gap").cast("int")).over(run))
    )
    return df.groupBy("user_id").agg(
        F.sum(F.col("is_gap").cast("int")).alias("n_gaps"),
        F.max("gap_us").alias("max_gap_us"),
        (F.max("segment_id") + 1).alias("n_segments"),
        F.count("*").alias("n_events"),
    )


W2_SQL = f"""
SELECT user_id,
       cast(sum(CASE WHEN is_gap THEN 1 ELSE 0 END) AS bigint) AS n_gaps,
       max(gap_us) AS max_gap_us,
       max(segment_id) + 1 AS n_segments,
       count(*) AS n_events
FROM (
  SELECT user_id, gap_us, is_gap,
         cast(sum(CASE WHEN is_gap THEN 1 ELSE 0 END) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint) AS segment_id
  FROM (
    SELECT user_id, ts, event_id,
           date_diff('microsecond', lag(ts) OVER w, ts) AS gap_us,
           coalesce(date_diff('microsecond', lag(ts) OVER w, ts) > {GAP_SEC * 1_000_000}, false) AS is_gap
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  )
)
GROUP BY user_id
"""


# --- A1/A2: tumbling-window robust stats (drift calibration analog) --------
# ref: /root/reference/src/utils/time_utils.py:156-217
def a1_hourly_stats(spark, sf_dir):
    ev = t(spark, sf_dir, "events").withColumn(
        "hour", F.date_trunc("hour", F.col("ts"))
    )
    std = F.stddev("value")
    return ev.groupBy("user_id", "hour").agg(
        F.count("*").alias("n"),
        dsum("value", "sum_value"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
        F.round(F.when(F.isnan(std), None).otherwise(std), 6).alias("std_value"),
    )


A1_SQL = """
SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n,
       round(cast(sum(cast(value as decimal(24,6))) as double), 4) AS sum_value,
       round(quantile_cont(value, 0.5), 6) AS median_value,
       round(stddev_samp(value), 6) AS std_value
FROM events GROUP BY user_id, date_trunc('hour', ts)
"""


# --- W5: clock-step detection (std > 3 x per-user median std) --------------
# ref: /root/reference/src/utils/time_utils.py:220-240
def w5_step_detection(spark, sf_dir):
    hourly = a1_hourly_stats(spark, sf_dir)
    med = hourly.groupBy("user_id").agg(
        F.expr("percentile(std_value, 0.5)").alias("med_std")
    )
    j = hourly.join(med, "user_id")
    return j.groupBy("user_id").agg(
        F.sum(
            F.coalesce(F.col("std_value") > 3.0 * F.col("med_std"), F.lit(False)).cast(
                "int"
            )
        ).alias("n_step_windows"),
        F.count("*").alias("n_windows"),
    )


W5_SQL = f"""
WITH hourly AS ({A1_SQL}),
med AS (SELECT user_id, quantile_cont(std_value, 0.5) AS med_std
        FROM hourly GROUP BY user_id)
SELECT hourly.user_id,
       cast(sum(CASE WHEN coalesce(std_value > 3.0 * med_std, false)
                THEN 1 ELSE 0 END) AS bigint) AS n_step_windows,
       count(*) AS n_windows
FROM hourly JOIN med ON hourly.user_id = med.user_id
GROUP BY hourly.user_id
"""


# --- J1: broadcast dimension enrich ----------------------------------------
# ref: circuit-params lookup /root/reference/src/transform/position.py:40-57
SEVERITY = [
    ("error", 3, "ops"),
    ("purchase", 2, "revenue"),
    ("signup", 2, "growth"),
    ("click", 1, "engagement"),
    ("view", 1, "engagement"),
]


def j1_broadcast_enrich(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    dim = F.broadcast(
        spark.createDataFrame(SEVERITY, ["event_type", "severity", "team"])
    )
    return (
        ev.join(dim, "event_type", "left")
        .groupBy("severity", "team")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
    )


J1_SQL = """
SELECT severity, team, count(*) AS n, {sum_value}
FROM events LEFT JOIN (VALUES {vals}) AS dim(event_type, severity, team)
  USING (event_type)
GROUP BY severity, team
""".format(
    sum_value=dsum_sql("value", "sum_value"),
    vals=", ".join(f"('{e}', {s}, '{tm}')" for e, s, tm in SEVERITY),
)


# --- J2: as-of / interval assignment ---------------------------------------
# ref: lap interval assignment /root/reference/src/transform/lap_repair.py:286-307
def j2_asof_last_error(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_err = F.max(
        F.when(F.col("event_type") == "error", F.col("ts"))
    ).over(w)
    df = ev.withColumn("last_error_ts", last_err).withColumn(
        "sec_since_error", F.expr("timestampdiff(SECOND, last_error_ts, ts)")
    )
    return df.groupBy("user_id").agg(
        F.sum((F.col("last_error_ts").isNotNull()).cast("int")).alias(
            "n_after_error"
        ),
        F.sum(
            F.coalesce(F.col("sec_since_error") <= 600, F.lit(False)).cast("int")
        ).alias("n_within_600s"),
    )


J2_SQL = """
SELECT user_id,
       cast(sum(CASE WHEN last_error_ts IS NOT NULL THEN 1 ELSE 0 END) AS bigint) AS n_after_error,
       cast(sum(CASE WHEN coalesce(date_diff('second', last_error_ts, ts) <= 600, false)
                THEN 1 ELSE 0 END) AS bigint) AS n_within_600s
FROM (
  SELECT user_id, ts,
         max(CASE WHEN event_type = 'error' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_ts
  FROM events
)
GROUP BY user_id
"""


# --- R1: long -> wide pivot -------------------------------------------------
# ref: /root/reference/src/transform/pivot.py:48-193
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def r1_pivot_wide(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.sum(F.col("value").cast("decimal(24,6)")).cast("double"), 4))
    )


R1_SQL = """
SELECT user_id,
       round(cast(sum(cast(value as decimal(24,6))) FILTER (WHERE event_type = 'click') as double), 4) AS click,
       round(cast(sum(cast(value as decimal(24,6))) FILTER (WHERE event_type = 'error') as double), 4) AS error,
       round(cast(sum(cast(value as decimal(24,6))) FILTER (WHERE event_type = 'purchase') as double), 4) AS purchase,
       round(cast(sum(cast(value as decimal(24,6))) FILTER (WHERE event_type = 'signup') as double), 4) AS signup,
       round(cast(sum(cast(value as decimal(24,6))) FILTER (WHERE event_type = 'view') as double), 4) AS view
FROM events GROUP BY user_id
"""


# --- A6: entities per frame -------------------------------------------------
# ref: cars-per-frame /root/reference/src/transform/sync.py:291-297
def a6_hourly_active(spark, sf_dir):
    ev = t(spark, sf_dir, "events").withColumn(
        "hour", F.date_trunc("hour", F.col("ts"))
    )
    return ev.groupBy("hour").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


A6_SQL = """
SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


# --- A9: gap-size histogram --------------------------------------------------
# ref: DATA_QUALITY_REPORT_BARBER_R1.md:428-433
def a9_gap_histogram(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    df = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn("gap_us", gap)
    m = 1_000_000
    bucket = (
        F.when(F.col("gap_us").isNull(), None)
        .when(F.col("gap_us") < 60 * m, "lt_1m")
        .when(F.col("gap_us") < 300 * m, "1m_5m")
        .when(F.col("gap_us") < 1800 * m, "5m_30m")
        .when(F.col("gap_us") < 7200 * m, "30m_2h")
        .otherwise("gt_2h")
    )
    return (
        df.withColumn("bucket", bucket)
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.max("gap_us").alias("max_gap_us"))
    )


A9_SQL = """
SELECT bucket, count(*) AS n, max(gap_us) AS max_gap_us
FROM (
  SELECT CASE WHEN gap_us IS NULL THEN NULL
              WHEN gap_us < 60000000 THEN 'lt_1m'
              WHEN gap_us < 300000000 THEN '1m_5m'
              WHEN gap_us < 1800000000 THEN '5m_30m'
              WHEN gap_us < 7200000000 THEN '30m_2h'
              ELSE 'gt_2h' END AS bucket,
         gap_us
  FROM (SELECT date_diff('microsecond', lag(ts) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_us
        FROM events)
)
WHERE bucket IS NOT NULL
GROUP BY bucket
"""


# --- V1/V2: validation-suite single-pass stats -------------------------------
# ref: /root/reference/src/validation/suite_builder.py:77-99,141-168
def v2_validation_stats(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("value").isNull().cast("int")).alias("n_null_value"),
        F.sum(((F.col("value") < 0) | (F.col("value") > 500)).cast("int")).alias(
            "n_out_of_range"
        ),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.sum(F.col("props").isNull().cast("int")).alias("n_null_props"),
    )


V2_SQL = """
SELECT count(*) AS n_rows,
       cast(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_null_value,
       cast(sum(CASE WHEN value < 0 OR value > 500 THEN 1 ELSE 0 END) AS bigint) AS n_out_of_range,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT event_type) AS n_event_types,
       min(ts) AS min_ts, max(ts) AS max_ts,
       cast(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_null_props
FROM events
"""


# --- V4: route fan-out --------------------------------------------------------
# ref: FAIL/WARN policy -> routing /root/reference/src/conf/validation_policy.yaml:7-80
def v4_route_fanout(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    k = F.regexp_extract("props", K_PATTERN, 1)
    route = (
        F.when(F.col("value") < 0.5, "quarantine")
        .when(F.col("event_type") == "error", "error_events")
        .otherwise("valid")
    )
    return (
        ev.withColumn("k", F.when(k == "", None).otherwise(k).cast("long"))
        .withColumn("route", route)
        .groupBy("route")
        .agg(
            F.count("*").alias("n_rows"),
            dsum("value", "sum_value"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


V4_SQL = f"""
SELECT route, count(*) AS n_rows, {dsum_sql('value', 'sum_value')},
       cast(sum(k) AS bigint) AS sum_k, count(DISTINCT user_id) AS n_users
FROM (
  SELECT *,
         CASE WHEN value < 0.5 THEN 'quarantine'
              WHEN event_type = 'error' THEN 'error_events'
              ELSE 'valid' END AS route,
         try_cast(regexp_extract(props, '{K_PATTERN}', 1) AS bigint) AS k
  FROM events
)
GROUP BY route
"""


# --- W8: limited forward-fill -------------------------------------------------
# ref: ffill limit 4 /root/reference/src/transform/resample.py:127,154-172
def w8_ffill_limit(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    k = F.regexp_extract("props", K_PATTERN, 1).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-4, 0)
    df = ev.withColumn(
        "value_n", F.when(k < 20, None).otherwise(F.col("value"))
    ).withColumn("value_filled", F.last("value_n", ignorenulls=True).over(frame))
    return df.groupBy("user_id").agg(
        F.sum(F.col("value_n").isNull().cast("int")).alias("n_null_before"),
        F.sum(F.col("value_filled").isNull().cast("int")).alias("n_null_after"),
        dsum("value_filled", "sum_filled"),
    )


W8_SQL = f"""
SELECT user_id,
       cast(sum(CASE WHEN value_n IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_null_before,
       cast(sum(CASE WHEN value_filled IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_null_after,
       {dsum_sql('value_filled', 'sum_filled')}
FROM (
  SELECT user_id, value_n,
         last_value(value_n IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS value_filled
  FROM (SELECT *, CASE WHEN try_cast(regexp_extract(props, '{K_PATTERN}', 1) AS bigint) < 20
                       THEN NULL ELSE value END AS value_n
        FROM events)
)
GROUP BY user_id
"""




# --- W7: uniform time-grid generation + left join --------------------------
# ref: /root/reference/src/transform/resample.py:31-56, sync.py:90-121
def w7_hour_grid(spark, sf_dir):
    ev = t(spark, sf_dir, "events").withColumn(
        "hour", F.date_trunc("hour", F.col("ts"))
    )
    spans = ev.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"),
    )
    hourly = ev.groupBy("user_id", "hour").agg(F.count("*").alias("n"))
    joined = grid.join(hourly, ["user_id", "hour"], "left")
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_slots"),
        F.sum(F.col("n").isNull().cast("int")).alias("n_empty"),
        F.sum(F.coalesce(F.col("n"), F.lit(0))).alias("n_events"),
    )


W7_SQL = """
WITH spans AS (
  SELECT user_id, min(date_trunc('hour', ts)) AS h0, max(date_trunc('hour', ts)) AS h1
  FROM events GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, interval 1 hour)) AS hour
  FROM spans
), hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT grid.user_id, count(*) AS n_slots,
       cast(sum(CASE WHEN hourly.n IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_empty,
       cast(sum(coalesce(hourly.n, 0)) AS bigint) AS n_events
FROM grid LEFT JOIN hourly ON grid.user_id = hourly.user_id AND grid.hour = hourly.hour
GROUP BY grid.user_id
"""


# --- W9: gap-aware linear interpolation -------------------------------------
# ref: /root/reference/src/transform/position.py:164-211 (2 s gap barrier),
#      /root/reference/src/transform/resample.py:359-381
INTERP_MAX_GAP_US = 1800 * 1_000_000


def w9_interpolate(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    k = F.regexp_extract("props", K_PATTERN, 1).cast("long")
    base = ev.withColumn(
        "value_n", F.when(k < 20, None).otherwise(F.col("value"))
    ).withColumn("ts_n", F.when(k < 20, None).otherwise(F.col("ts")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    past = w.rowsBetween(Window.unboundedPreceding, -1)
    future = w.rowsBetween(1, Window.unboundedFollowing)
    df = (
        base.withColumn("prev_v", F.last("value_n", ignorenulls=True).over(past))
        .withColumn("prev_t", F.last("ts_n", ignorenulls=True).over(past))
        .withColumn("next_v", F.first("value_n", ignorenulls=True).over(future))
        .withColumn("next_t", F.first("ts_n", ignorenulls=True).over(future))
        .withColumn("span_us", F.expr("timestampdiff(MICROSECOND, prev_t, next_t)"))
        .withColumn("off_us", F.expr("timestampdiff(MICROSECOND, prev_t, ts)"))
    )
    can = (
        F.col("value_n").isNull()
        & F.col("prev_v").isNotNull()
        & F.col("next_v").isNotNull()
        & (F.col("span_us") <= INTERP_MAX_GAP_US)
    )
    interp = F.round(
        F.col("prev_v")
        + (F.col("next_v") - F.col("prev_v")) * (F.col("off_us") / F.col("span_us")),
        6,
    )
    df = df.withColumn("interp", F.when(can, interp))
    return df.groupBy("user_id").agg(
        F.count("interp").alias("n_interpolated"),
        F.sum(F.col("value_n").isNull().cast("int")).alias("n_null_before"),
        dsum("interp", "sum_interp"),
    )


W9_SQL = f"""
SELECT user_id, count(interp) AS n_interpolated,
       cast(sum(CASE WHEN value_n IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_null_before,
       {dsum_sql('interp', 'sum_interp')}
FROM (
  SELECT user_id, value_n,
         CASE WHEN value_n IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL
                   AND span_us <= {INTERP_MAX_GAP_US}
              THEN round(prev_v + (next_v - prev_v) * (off_us / span_us), 6)
         END AS interp
  FROM (
    SELECT user_id, value_n,
           last_value(value_n IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
           first_value(value_n IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
           date_diff('microsecond',
             last_value(ts_n IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             first_value(ts_n IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)) AS span_us,
           date_diff('microsecond',
             last_value(ts_n IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             ts) AS off_us
    FROM (SELECT *,
                 CASE WHEN try_cast(regexp_extract(props, '{{K}}', 1) AS bigint) < 20
                      THEN NULL ELSE value END AS value_n,
                 CASE WHEN try_cast(regexp_extract(props, '{{K}}', 1) AS bigint) < 20
                      THEN NULL ELSE ts END AS ts_n
          FROM events)
  )
)
GROUP BY user_id
""".replace("{K}", K_PATTERN)


# --- W10: derived rate + centered rolling median -----------------------------
# ref: derived speed /root/reference/src/transform/resample.py:250-295
def w10_derived_rate(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    centered = w.rowsBetween(-2, 2)
    df = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("prev_v", F.lag("value").over(w))
        .withColumn("dt_us", F.expr("timestampdiff(MICROSECOND, prev_ts, ts)"))
        .withColumn(
            "rate",
            F.when(
                F.col("dt_us") > 0,
                (F.col("value") - F.col("prev_v")) / (F.col("dt_us") / 1_000_000.0),
            ),
        )
        .withColumn("rate_smooth", F.expr("percentile(rate, 0.5)").over(centered))
    )
    return df.groupBy("user_id").agg(
        F.count("rate").alias("n_rates"),
        (F.round(F.expr("percentile(rate_smooth, 0.5)"), 6) + F.lit(0.0)).alias("p50_rate_smooth"),
        (F.round(F.min("rate_smooth"), 6) + F.lit(0.0)).alias("min_rate_smooth"),
        (F.round(F.max("rate_smooth"), 6) + F.lit(0.0)).alias("max_rate_smooth"),
    )


W10_SQL = """
SELECT user_id, count(rate) AS n_rates,
       round(quantile_cont(rate_smooth, 0.5), 6) + 0.0 AS p50_rate_smooth,
       round(min(rate_smooth), 6) + 0.0 AS min_rate_smooth,
       round(max(rate_smooth), 6) + 0.0 AS max_rate_smooth
FROM (
  SELECT user_id, rate,
         median(rate) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS rate_smooth
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN date_diff('microsecond', lag(ts) OVER w, ts) > 0
                THEN (value - lag(value) OVER w)
                     / (date_diff('microsecond', lag(ts) OVER w, ts) / 1000000.0)
           END AS rate
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  )
)
GROUP BY user_id
"""


QUERIES = {
    "p1_regex_parse": (p1_regex_parse, P1_SQL),
    "d1_dedup_keep_last": (d1_dedup_keep_last, D1_SQL),
    "w1_monotonic_repair": (w1_monotonic_repair, W1_SQL),
    "w2_gaps_segments": (w2_gaps_segments, W2_SQL),
    "a1_hourly_stats": (a1_hourly_stats, A1_SQL),
    "w5_step_detection": (w5_step_detection, W5_SQL),
    "j1_broadcast_enrich": (j1_broadcast_enrich, J1_SQL),
    "j2_asof_last_error": (j2_asof_last_error, J2_SQL),
    "r1_pivot_wide": (r1_pivot_wide, R1_SQL),
    "a6_hourly_active": (a6_hourly_active, A6_SQL),
    "a9_gap_histogram": (a9_gap_histogram, A9_SQL),
    "v2_validation_stats": (v2_validation_stats, V2_SQL),
    "v4_route_fanout": (v4_route_fanout, V4_SQL),
    "w8_ffill_limit": (w8_ffill_limit, W8_SQL),
    "w7_hour_grid": (w7_hour_grid, W7_SQL),
    "w9_interpolate": (w9_interpolate, W9_SQL),
    "w10_derived_rate": (w10_derived_rate, W10_SQL),
}
