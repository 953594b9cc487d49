"""Feature/validation operator queries completing the SURVEY.md §2 map:
boundary detection with confidence (W6), per-segment features + session
rollup (A7), baseline regression compare (J5/V5), data-driven unit
normalization (P3), DDMM->degrees + haversine (P4/P8), drift rollup (A3).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import dsum, dsum_sql, t
from .log_ops import A1_SQL, a1_hourly_stats

GAP_US = 3600 * 1_000_000


# --- W6: boundary detectors + duration-validated confidence -----------------
# ref: lap detectors /root/reference/src/transform/lap_repair.py:18-57,118-255
# detector A (value reset) takes precedence over detector B (type marker);
# confidence 1.0 / 0.8, x0.5 if the implied duration is too short, x0.7 too long
def w6_boundary_confidence(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    df = (
        ev.withColumn("prev_v", F.lag("value").over(w))
        .withColumn("prev_t", F.lag("event_type").over(w))
        .withColumn(
            "det_a",
            F.coalesce(
                (F.col("value") - F.col("prev_v") < -250) & (F.col("prev_v") > 300),
                F.lit(False),
            ),
        )
        .withColumn(
            "det_b",
            F.coalesce(
                (F.col("event_type") == "signup") & (F.col("prev_t") != "signup"),
                F.lit(False),
            ),
        )
        .withColumn("is_boundary", F.col("det_a") | F.col("det_b"))
    )
    b = df.filter(F.col("is_boundary"))
    wb = Window.partitionBy("user_id").orderBy("ts", "event_id")
    b = b.withColumn(
        "dur_us", F.expr("timestampdiff(MICROSECOND, lag(ts) over "
                         "(partition by user_id order by ts, event_id), ts)")
    ).withColumn(
        "confidence",
        F.round(
            F.when(F.col("det_a"), 1.0).otherwise(0.8)
            * F.when(F.col("dur_us") < 600 * 1_000_000, 0.5)
            .when(F.col("dur_us") > 86400 * 1_000_000, 0.7)
            .otherwise(1.0),
            2,
        ),
    )
    return b.groupBy("user_id").agg(
        F.count("*").alias("n_boundaries"),
        F.sum(F.col("det_a").cast("int")).alias("n_reset_detected"),
        F.sum((~F.col("det_a")).cast("int")).alias("n_marker_detected"),
        F.round(F.sum(F.col("confidence").cast("decimal(24,6)")).cast("double"), 2)
        .alias("sum_confidence"),
    )


W6_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         coalesce((value - lag(value) OVER w < -250)
                  AND (lag(value) OVER w > 300), false) AS det_a,
         coalesce(event_type = 'signup'
                  AND lag(event_type) OVER w <> 'signup', false) AS det_b
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), b AS (
  SELECT user_id, det_a,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS dur_us
  FROM flagged WHERE det_a OR det_b
)
SELECT user_id, count(*) AS n_boundaries,
       cast(sum(CASE WHEN det_a THEN 1 ELSE 0 END) AS bigint) AS n_reset_detected,
       cast(sum(CASE WHEN det_a THEN 0 ELSE 1 END) AS bigint) AS n_marker_detected,
       round(cast(sum(cast(round(
         (CASE WHEN det_a THEN 1.0 ELSE 0.8 END)
         * (CASE WHEN dur_us < 600000000 THEN 0.5
                 WHEN dur_us > 86400000000 THEN 0.7 ELSE 1.0 END), 2)
         as decimal(24,6))) as double), 2) AS sum_confidence
FROM b GROUP BY user_id
"""


# --- A7: per-segment features + session rollup -------------------------------
# ref: LapFeatures/PerLapSummary /root/reference/src/schemas/features.py:8-130
def a7_segment_features(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    df = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("is_gap", F.coalesce(gap > GAP_US, F.lit(False)))
        .withColumn("segment_id", F.sum(F.col("is_gap").cast("int")).over(run))
        .withColumn("prev_type", F.lag("event_type").over(w))
    )
    ws = Window.partitionBy("user_id", "segment_id").orderBy("ts", "event_id")
    df = df.withColumn(
        "is_transition",
        F.coalesce(F.lag("event_type").over(ws) != F.col("event_type"), F.lit(False)),
    )
    return df.groupBy("user_id", "segment_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.max("value"), 4).alias("max_value"),
        dsum("value", "sum_value"),
        F.sum((F.col("event_type") == "click").cast("int")).alias("n_clicks"),
        F.sum((F.col("event_type") == "error").cast("int")).alias("n_errors"),
        F.sum(F.col("is_transition").cast("int")).alias("n_transitions"),
        F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").alias("duration_us"),
    )


A7_SQL = f"""
WITH seg AS (
  SELECT user_id, ts, event_id, event_type, value,
         cast(sum(CASE WHEN is_gap THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint) AS segment_id
  FROM (SELECT *, coalesce(date_diff('microsecond',
              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
              > {GAP_US}, false) AS is_gap
        FROM events)
), tr AS (
  SELECT *, coalesce(lag(event_type) OVER (
      PARTITION BY user_id, segment_id ORDER BY ts, event_id) <> event_type,
      false) AS is_transition
  FROM seg
)
SELECT user_id, segment_id, count(*) AS n_events,
       round(max(value), 4) AS max_value,
       {dsum_sql('value', 'sum_value')},
       cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS bigint) AS n_clicks,
       cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS bigint) AS n_errors,
       cast(sum(CASE WHEN is_transition THEN 1 ELSE 0 END) AS bigint) AS n_transitions,
       date_diff('microsecond', min(ts), max(ts)) AS duration_us
FROM tr GROUP BY user_id, segment_id
"""


def a7_session_rollup(spark, sf_dir):
    seg = a7_segment_features(spark, sf_dir)
    return seg.groupBy("user_id").agg(
        F.count("*").alias("n_segments"),
        F.max("duration_us").alias("longest_segment_us"),
        F.min("duration_us").alias("shortest_segment_us"),
        F.sum("n_transitions").alias("total_transitions"),
        F.max("n_events").alias("max_segment_events"),
    )


A7B_SQL = f"""
SELECT user_id, count(*) AS n_segments,
       max(duration_us) AS longest_segment_us,
       min(duration_us) AS shortest_segment_us,
       cast(sum(n_transitions) AS bigint) AS total_transitions,
       max(n_events) AS max_segment_events
FROM ({A7_SQL}) GROUP BY user_id
"""


# --- J5/V5: baseline regression compare ---------------------------------------
# ref: /root/reference/src/validation/baseline_validator.py:124-210,337-386
SPLIT_TS = "2024-01-16 00:00:00"


def j5_baseline_compare(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    base = (
        ev.filter(F.col("ts") < SPLIT_TS)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_base"))
    )
    actual = (
        ev.filter(F.col("ts") >= SPLIT_TS)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_actual"))
    )
    j = base.join(actual, ["user_id", "event_type"], "full_outer")
    verdict = (
        F.when(F.col("n_base").isNull(), "NEW")
        .when(F.col("n_actual").isNull(), "MISSING")
        .when(
            (F.col("n_actual") >= 0.5 * F.col("n_base"))
            & (F.col("n_actual") <= 1.5 * F.col("n_base")),
            "PASS",
        )
        .otherwise("FAIL")
    )
    return j.withColumn("verdict", verdict)


J5_SQL = f"""
WITH base AS (
  SELECT user_id, event_type, count(*) AS n_base FROM events
  WHERE ts < timestamp '{SPLIT_TS}' GROUP BY 1, 2
), actual AS (
  SELECT user_id, event_type, count(*) AS n_actual FROM events
  WHERE ts >= timestamp '{SPLIT_TS}' GROUP BY 1, 2
)
SELECT coalesce(base.user_id, actual.user_id) AS user_id,
       coalesce(base.event_type, actual.event_type) AS event_type,
       n_base, n_actual,
       CASE WHEN n_base IS NULL THEN 'NEW'
            WHEN n_actual IS NULL THEN 'MISSING'
            WHEN n_actual >= 0.5 * n_base AND n_actual <= 1.5 * n_base THEN 'PASS'
            ELSE 'FAIL' END AS verdict
FROM base FULL OUTER JOIN actual USING (user_id, event_type)
"""


# --- P3: data-driven unit normalization ----------------------------------------
# ref: /root/reference/src/transform/pivot.py:153-171 (speed unit detection
# by mean > threshold; raw preserved)
def p3_unit_normalization(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    detect = ev.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(24,6)")).cast("double")
            / F.count("value")
            > 50.0
        ).alias("is_centi")
    )
    j = ev.join(F.broadcast(detect), "event_type")
    norm = F.when(F.col("is_centi"), F.col("value") / 100.0).otherwise(F.col("value"))
    return (
        j.withColumn("value_norm", F.round(norm, 6))
        .groupBy("event_type", "is_centi")
        .agg(
            F.count("*").alias("n"),
            dsum("value_norm", "sum_norm", 4),
            F.round(F.max("value_norm"), 6).alias("max_norm"),
        )
    )


P3_SQL = """
WITH detect AS (
  SELECT event_type,
         cast(sum(cast(value as decimal(24,6))) as double) / count(value) > 50.0
           AS is_centi
  FROM events GROUP BY event_type
)
SELECT event_type, is_centi, count(*) AS n,
       round(cast(sum(cast(value_norm as decimal(24,6))) as double), 4) AS sum_norm,
       round(max(value_norm), 6) AS max_norm
FROM (
  SELECT events.event_type, is_centi,
         round(CASE WHEN is_centi THEN value / 100.0 ELSE value END, 6) AS value_norm
  FROM events JOIN detect USING (event_type)
)
GROUP BY event_type, is_centi
"""


# --- P4/P8: DDMM.MMMM -> degrees + haversine distance ---------------------------
# ref: /root/reference/src/transform/position.py:60-92 (conversion),
#      /root/reference/src/transform/resample.py:277-292 (haversine)
def p8_haversine_track(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    # interpret value as DDMM.MM latitude-like and a derived longitude
    lat_deg = F.floor(F.col("value") / 100) + (
        F.col("value") - F.floor(F.col("value") / 100) * 100
    ) / 60.0
    lon_deg = F.lit(-86.0) - (F.col("event_id") % 1000) / 10000.0
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    df = (
        ev.withColumn("lat", F.radians(lat_deg))
        .withColumn("lon", F.radians(lon_deg))
        .withColumn("plat", F.lag("lat").over(w))
        .withColumn("plon", F.lag("lon").over(w))
    )
    a = (
        F.pow(F.sin((F.col("lat") - F.col("plat")) / 2), 2)
        + F.cos(F.col("plat"))
        * F.cos(F.col("lat"))
        * F.pow(F.sin((F.col("lon") - F.col("plon")) / 2), 2)
    )
    dist_km = F.round(2 * 6371.0 * F.asin(F.sqrt(a)), 4)
    df = df.withColumn("step_km", dist_km)
    return df.groupBy("user_id").agg(
        F.count("step_km").alias("n_steps"),
        dsum("step_km", "total_km", 2),
        F.round(F.max("step_km"), 4).alias("max_step_km"),
    )


P8_SQL = """
SELECT user_id, count(step_km) AS n_steps,
       round(cast(sum(cast(step_km as decimal(24,6))) as double), 2) AS total_km,
       round(max(step_km), 4) AS max_step_km
FROM (
  SELECT user_id,
         round(2 * 6371.0 * asin(sqrt(
           pow(sin((lat - plat) / 2), 2)
           + cos(plat) * cos(lat) * pow(sin((lon - plon) / 2), 2)
         )), 4) AS step_km
  FROM (
    SELECT user_id, lat, lon,
           lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
    FROM (
      SELECT user_id, ts, event_id,
             radians(floor(value / 100) + (value - floor(value / 100) * 100) / 60.0) AS lat,
             radians(-86.0 - (event_id % 1000) / 10000.0) AS lon
      FROM events
    ) WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  )
)
GROUP BY user_id
"""


# --- A3: overall drift rollup (second-level agg over A1) ------------------------
# ref: /root/reference/src/transform/drift.py:166-194
def a3_drift_rollup(spark, sf_dir):
    # rollup-of-rollup medians round at 7 dp, one digit FINER than the
    # 6-dp inputs from a1: with an even window count the interpolated
    # median of two 6-dp values lands exactly on a 6-dp half-boundary
    # (x.xxxxxx5), where Spark (decimal HALF_UP) and DuckDB (binary)
    # round apart — seen live at sf0.1. At 7 dp the same value sits ON
    # the grid, so rounding is an identity on the shared double and can
    # never split.
    hourly = a1_hourly_stats(spark, sf_dir)
    return hourly.groupBy("user_id").agg(
        F.count("*").alias("n_windows"),
        F.round(F.expr("percentile(median_value, 0.5)"), 7).alias(
            "median_of_medians"
        ),
        F.round(F.expr("percentile(std_value, 0.5)"), 7).alias("median_std"),
        F.sum("n").alias("n_samples"),
    )


A3_SQL = f"""
SELECT user_id, count(*) AS n_windows,
       round(quantile_cont(median_value, 0.5), 7) AS median_of_medians,
       round(quantile_cont(std_value, 0.5), 7) AS median_std,
       cast(sum(n) AS bigint) AS n_samples
FROM ({A1_SQL}) GROUP BY user_id
"""


# --- R2: pivot presence / missing-signal accounting --------------------------
# ref: /root/reference/src/transform/pivot.py:28-45,130-135,174-189
def r2_pivot_presence(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types_present")
    )
    return (
        per_user.withColumn("n_types_missing", F.lit(5) - F.col("n_types_present"))
        .groupBy("n_types_present", "n_types_missing")
        .agg(F.count("*").alias("n_users"))
    )


R2_SQL = """
SELECT n_types_present, 5 - n_types_present AS n_types_missing,
       count(*) AS n_users
FROM (SELECT user_id, count(DISTINCT event_type) AS n_types_present
      FROM events GROUP BY user_id)
GROUP BY n_types_present
"""




# --- A5: coverage metrics / sim-ready flags -----------------------------------
# ref: coverage + sim-ready /root/reference/src/transform/resample.py:196-230,
#      409-436; per-car coverage custom expectation
#      /root/reference/src/validation/custom_expectations.py:14-131
def a5_coverage(spark, sf_dir):
    ev = t(spark, sf_dir, "events").withColumn(
        "hour", F.date_trunc("hour", F.col("ts"))
    )
    per_user = ev.groupBy("user_id").agg(
        F.countDistinct("hour").alias("n_hours_active"),
        (F.expr("timestampdiff(HOUR, date_trunc('hour', min(ts)), "
                "date_trunc('hour', max(ts)))") + 1).alias("n_hours_span"),
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("n_purchases"),
    )
    # integer threshold compare (active/span >= 0.10) without a quotient
    ready = (F.col("n_hours_active") * 10 >= F.col("n_hours_span")) & (
        F.col("n_purchases") > 0
    )
    return per_user.withColumn("sim_ready", ready)


A5_SQL = """
SELECT user_id, n_hours_active, n_hours_span, n_purchases,
       (n_hours_active * 10 >= n_hours_span) AND (n_purchases > 0) AS sim_ready
FROM (
  SELECT user_id,
         count(DISTINCT date_trunc('hour', ts)) AS n_hours_active,
         date_diff('hour', date_trunc('hour', min(ts)),
                   date_trunc('hour', max(ts))) + 1 AS n_hours_span,
         cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bigint)
           AS n_purchases
  FROM events GROUP BY user_id
)
"""


QUERIES = {
    "r2_pivot_presence": (r2_pivot_presence, R2_SQL),
    "w6_boundary_confidence": (w6_boundary_confidence, W6_SQL),
    "a7_segment_features": (a7_segment_features, A7_SQL),
    "a7_session_rollup": (a7_session_rollup, A7B_SQL),
    "j5_baseline_compare": (j5_baseline_compare, J5_SQL),
    "p3_unit_normalization": (p3_unit_normalization, P3_SQL),
    "p8_haversine_track": (p8_haversine_track, P8_SQL),
    "a3_drift_rollup": (a3_drift_rollup, A3_SQL),
    "a5_coverage": (a5_coverage, A5_SQL),
}
