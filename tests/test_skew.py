"""Salted (turn-range bucketed) sync must be byte-identical to the plain
per-conv window chain, including on hot conversations that span many
buckets (FIXTURES.md §5 test_skew_hot_conv)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from racing_telemetry_pipeline_spark.operators.anomalies import add_time_flags
from racing_telemetry_pipeline_spark.operators.dedup import (
    add_ingest_ordinal,
    dedup_keep_last,
)
from racing_telemetry_pipeline_spark.operators.drift import monotonic_repair
from racing_telemetry_pipeline_spark.operators.skew import salted_parse_sync

COLS = [
    "conv_id", "turn_idx", "text", "ts", "dt_sec",
    "is_backwards", "is_gap", "segment_id", "ts_sync",
]


def _plain(spark, raw_dir):
    raw = add_ingest_ordinal(spark.read.parquet(raw_dir))
    return monotonic_repair(
        add_time_flags(dedup_keep_last(raw, drop_ordinal=True))
    ).select(*COLS)


def _salted(spark, raw_dir, bucket_turns):
    raw = add_ingest_ordinal(spark.read.parquet(raw_dir))
    return salted_parse_sync(raw, bucket_turns=bucket_turns).select(*COLS)


def test_salted_equals_plain(spark, raw_unit):
    plain = _plain(spark, raw_unit).orderBy("conv_id", "turn_idx").toPandas()
    # bucket width 64 forces the hot conversation across MANY buckets so
    # every stitching path (boundary flags, prefix max, segment offsets)
    # is exercised
    for bucket_turns in (64, 32768):
        salted = (
            _salted(spark, raw_unit, bucket_turns)
            .orderBy("conv_id", "turn_idx")
            .toPandas()
        )
        pd.testing.assert_frame_equal(salted, plain)


def test_salted_no_conv_straggler_partition(spark, raw_unit):
    """No (conv, bucket) group exceeds the bucket width — the straggler
    bound that makes hot conversations scale."""
    raw = add_ingest_ordinal(spark.read.parquet(raw_unit))
    out = salted_parse_sync(raw, bucket_turns=64)
    biggest = (
        out.groupBy("conv_id", F.floor(F.col("turn_idx") / 64).alias("b"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert biggest <= 64
    # and a hot conversation really does span multiple buckets
    n_buckets = (
        out.groupBy("conv_id", F.floor(F.col("turn_idx") / 64).alias("b"))
        .count()
        .groupBy("conv_id")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert n_buckets > 1


def test_salted_prev_us_matches_plain_lag(spark, raw_unit):
    """The skew-safe lag behind role_latency_percentiles must equal the
    plain conv-wide lag — including across rows removed by an upstream
    filter (the quarantine drop), where the previous EXISTING row may sit
    several buckets back."""
    from pyspark.sql import Window

    from racing_telemetry_pipeline_spark.operators.skew import salted_prev_ts_us

    base = _plain(spark, raw_unit)
    # emulate the role-latency call shape: filter some rows first, then lag
    filtered = base.filter(F.col("turn_idx") % 7 != 3)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    us = F.unix_micros(F.col("ts_sync").cast("timestamp"))
    want = (
        filtered.withColumn("_want", F.lag(us).over(w))
        .select("conv_id", "turn_idx", "_want")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    for bucket_turns in (16, 32768):
        got = (
            salted_prev_ts_us(filtered, ts_col="ts_sync", bucket_turns=bucket_turns)
            .select("conv_id", "turn_idx", F.col("_prev_us").alias("_want"))
            .orderBy("conv_id", "turn_idx")
            .toPandas()
        )
        pd.testing.assert_frame_equal(got, want)


def test_role_latency_salted_equals_unsalted_window(spark, raw_unit):
    """role_latency_percentiles (salted lag) must reproduce the reference
    formulation exactly: a plain conv-wide window over non-quarantined
    rows, grouped per role with exact percentiles."""
    from pyspark.sql import Window

    from racing_telemetry_pipeline_spark.config import DEFAULTS
    from racing_telemetry_pipeline_spark.operators.aggregates import (
        role_latency_percentiles,
    )
    from racing_telemetry_pipeline_spark.plans.pipeline import _build_routed

    routed = _build_routed(spark, raw_unit, DEFAULTS, "builtin")
    got = role_latency_percentiles(routed, bucket_turns=16).toPandas()

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    us = F.unix_micros(F.col("ts_sync").cast("timestamp"))
    flow = (
        routed.filter(F.col("route") != "quarantine")
        .withColumn("turn_latency_sec", (us - F.lag(us).over(w)) / F.lit(1e6))
        .filter(F.col("turn_latency_sec").isNotNull())
    )
    want = (
        flow.groupBy("role")
        .agg(
            F.count("*").alias("n_turns"),
            F.expr("percentile(turn_latency_sec, array(0.5, 0.95, 0.99))").alias("_p"),
        )
        .select(
            "role",
            "n_turns",
            F.round(F.col("_p")[0], 6).alias("p50_latency_sec"),
            F.round(F.col("_p")[1], 6).alias("p95_latency_sec"),
            F.round(F.col("_p")[2], 6).alias("p99_latency_sec"),
        )
        .orderBy("role")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, want)
