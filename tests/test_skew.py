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
