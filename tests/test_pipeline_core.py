"""Core operator correctness vs the pandas oracle (FIXTURES.md §5)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from racing_telemetry_pipeline_spark.functions.grok import parse_text
from racing_telemetry_pipeline_spark.operators.anomalies import add_time_flags
from racing_telemetry_pipeline_spark.operators.dedup import (
    add_ingest_ordinal,
    dedup_keep_last,
)
from racing_telemetry_pipeline_spark.operators.drift import (
    count_backwards,
    monotonic_repair,
)

from .conftest import assert_pdf_equal


def _deduped(spark, raw_dir, mode="single_shuffle"):
    raw = spark.read.parquet(raw_dir)
    return dedup_keep_last(add_ingest_ordinal(raw), drop_ordinal=True, mode=mode)


def test_dedup_keep_last(spark, raw_unit, oracle_unit):
    want = oracle_unit["routed"][["conv_id", "turn_idx", "text", "ts"]]
    for mode in ("single_shuffle", "per_key"):
        got = _deduped(spark, raw_unit, mode).select("conv_id", "turn_idx", "text", "ts")
        assert_pdf_equal(got, want, ["conv_id", "turn_idx"])
    # no stale (earlier-copy) text survives keep-last
    n_stale = (
        _deduped(spark, raw_unit).filter(F.col("text").startswith("<<stale>>")).count()
    )
    assert n_stale == 0
    # dropped count is exact: raw minus distinct keys
    raw = spark.read.parquet(raw_unit)
    assert _deduped(spark, raw_unit).count() == raw.select("conv_id", "turn_idx").distinct().count()


def test_parse_fields_both_engines(spark, raw_unit, oracle_unit):
    cols = ["conv_id", "turn_idx", "tool_name", "args_bytes", "latency_ms",
            "event_kind", "has_tool_markup", "parse_ok"]
    want = oracle_unit["routed"].copy()
    # oracle applies sentinel nulling after parse; undo for the raw-parse compare
    df_unit = want[cols].copy()
    for engine in ("pandas_udf", "builtin"):
        got = parse_text(_deduped(spark, raw_unit), engine=engine).select(*cols)
        got_pdf = got.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        want_pdf = df_unit.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        for c in ("tool_name", "event_kind", "has_tool_markup", "parse_ok"):
            g, w = got_pdf[c], want_pdf[c]
            assert g.isna().equals(w.isna()), (engine, c)
            assert (g.dropna().astype(str) == w.dropna().astype(str)).all(), (engine, c)
        # sentinel rows differ (oracle already nulled); compare the rest
        sent = want_pdf["latency_ms"].isna() & got_pdf["latency_ms"].notna()
        assert (got_pdf.loc[sent, "latency_ms"] == 32768).all()
        ok = ~sent
        assert (
            got_pdf.loc[ok, "latency_ms"].fillna(-1).astype("int64")
            == want_pdf.loc[ok, "latency_ms"].fillna(-1).astype("int64")
        ).all(), engine


def test_ts_repair_monotonic(spark, raw_unit):
    df = monotonic_repair(_deduped(spark, raw_unit))
    assert count_backwards(df, "conv_id", "turn_idx", "ts_sync") == 0
    # clean conversations byte-unchanged: ts_sync == ts wherever conv had no backwards
    flags = add_time_flags(df)
    dirty = flags.groupBy("conv_id").agg(
        F.max(F.col("is_backwards").cast("int")).alias("dirty")
    )
    joined = df.join(dirty, "conv_id")
    changed_clean = joined.filter(
        (F.col("dirty") == 0) & (F.col("ts_sync") != F.col("ts"))
    ).count()
    assert changed_clean == 0
    # pathological convs exist in the fixture and get repaired
    assert dirty.filter(F.col("dirty") == 1).count() > 0


def test_segment_ids_and_flags(spark, raw_unit, oracle_unit):
    got = add_time_flags(_deduped(spark, raw_unit)).select(
        "conv_id", "turn_idx", "dt_sec", "is_backwards", "is_gap", "segment_id"
    )
    want = oracle_unit["routed"][
        ["conv_id", "turn_idx", "dt_sec", "is_backwards", "is_gap", "segment_id"]
    ]
    assert_pdf_equal(got, want, ["conv_id", "turn_idx"])
