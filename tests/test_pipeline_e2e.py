"""End-to-end pipeline vs oracle: routing counts, aggregates, per-turn text
equality, resume idempotence, skew salting (FIXTURES.md §5)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from racing_telemetry_pipeline_spark.plans.pipeline import run_pipeline
from racing_telemetry_pipeline_spark.sources.lake import Lake

from .conftest import assert_pdf_equal


@pytest.fixture(scope="module")
def lake_small(spark, raw_small, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lake_small"))
    run_pipeline(spark, raw_small, root)
    return Lake(spark, root)


def test_routing_counts(lake_small, oracle_small):
    got = lake_small.read("agg_sink_counts")
    assert_pdf_equal(got, oracle_small["sink_counts"], ["route"])
    # all three sinks actually receive rows at sf-small
    routes = set(got.toPandas()["route"])
    assert routes == {"valid", "quarantine", "tool_events"}


def test_turns_per_conversation(lake_small, oracle_small):
    got = lake_small.read("agg_turns_per_conversation")
    assert_pdf_equal(got, oracle_small["turns_per_conversation"], ["route", "conv_id"])


def test_tool_frequency(lake_small, oracle_small):
    got = lake_small.read("agg_tool_frequency")
    assert_pdf_equal(got, oracle_small["tool_frequency"], ["tool_name"])


def test_role_latency_percentiles(lake_small, oracle_small):
    got = lake_small.read("agg_role_latency")
    assert_pdf_equal(got, oracle_small["role_latency"], ["role"])


def test_turn_text_equality(lake_small, oracle_small):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the north-star per-row invariant."""
    got = (
        lake_small.read("routed")
        .select("conv_id", "turn_idx", "text", "route")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    want = (
        oracle_small["routed"][["conv_id", "turn_idx", "text", "route"]]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_quarantine_reasons(lake_small, oracle_small):
    got = (
        lake_small.read("routed")
        .filter(F.col("route") == "quarantine")
        .groupBy("reason")
        .count()
        .toPandas()
        .set_index("reason")["count"]
        .sort_index()
    )
    o = oracle_small["routed"]
    want = (
        o[o["route"] == "quarantine"].groupby("reason").size().sort_index()
    )
    assert got.to_dict() == want.to_dict()
    assert {"unknown_role", "malformed_tool_call", "negative_latency"} <= set(got.index)


def test_drift_calibration(lake_small, oracle_small):
    got = lake_small.read("drift_calibration")
    assert_pdf_equal(
        got, oracle_small["drift_calibration"], ["conv_id", "win_start"], atol=1e-9
    )


def test_resume_idempotent(spark, raw_unit, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lake_resume"))
    # simulate failure after first stage, then resume
    r1 = run_pipeline(spark, raw_unit, root, stop_after="routed")
    assert r1.stages_run == ["routed"]
    routed_dir = os.path.join(root, "routed")
    mtime_before = max(
        os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(routed_dir)
        for f in fs
    )
    r2 = run_pipeline(spark, raw_unit, root)
    assert "routed" in r2.stages_skipped  # stage 1 NOT recomputed
    assert set(r2.stages_run) == {"drift_calibration", "aggregates", "lineage"}
    # third run with nothing changed: every stage skipped
    r3 = run_pipeline(spark, raw_unit, root)
    assert r3.stages_run == []
    assert set(r3.stages_skipped) == {
        "routed",
        "drift_calibration",
        "aggregates",
        "lineage",
    }
    mtime_after = max(
        os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(routed_dir)
        for f in fs
    )
    assert mtime_before == mtime_after

    # full fresh run produces identical sink contents
    root2 = str(tmp_path_factory.mktemp("lake_fresh"))
    run_pipeline(spark, raw_unit, root2)
    for t in ("routed", "agg_sink_counts", "agg_role_latency"):
        a = (
            spark.read.parquet(os.path.join(root, t))
            .orderBy(*spark.read.parquet(os.path.join(root, t)).columns)
            .toPandas()
        )
        b = (
            spark.read.parquet(os.path.join(root2, t))
            .orderBy(*spark.read.parquet(os.path.join(root2, t)).columns)
            .toPandas()
        )
        pd.testing.assert_frame_equal(a, b)


def test_lineage_and_metrics_emitted(lake_small):
    lineage = lake_small.read("lineage_routed").toPandas()
    assert (lineage["n_rows"] > 0).all()
    assert lineage["stage"].eq("routed").all()
    assert lineage["input_snapshot"].nunique() == 1
    metrics = lake_small.read("metrics_routed").toPandas()
    assert set(metrics["route"]) == {"valid", "quarantine", "tool_events"}


def test_parse_engines_agree_end_to_end(spark, raw_unit, tmp_path_factory):
    roots = {}
    for engine in ("pandas_udf", "builtin"):
        root = str(tmp_path_factory.mktemp(f"lake_{engine}"))
        run_pipeline(spark, raw_unit, root, parse_engine=engine)
        roots[engine] = root
    a = (
        spark.read.parquet(os.path.join(roots["pandas_udf"], "routed"))
        .select("conv_id", "turn_idx", "route", "reason", "tool_name", "latency_ms")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    b = (
        spark.read.parquet(os.path.join(roots["builtin"], "routed"))
        .select("conv_id", "turn_idx", "route", "reason", "tool_name", "latency_ms")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_observed_metrics_match_data(lake_small, oracle_small):
    """observe()-captured write metrics equal oracle ground truth."""
    m = lake_small.stage_metrics("routed")
    o = oracle_small["routed"]
    assert m["n_rows"] == len(o)
    assert m["n_quarantined"] == (o["route"] == "quarantine").sum()
    assert m["n_tool_calls"] == o["parse_ok"].sum()
    assert m["n_backwards_raw"] == o["is_backwards"].sum()
    assert m["n_gaps"] == o["is_gap"].sum()
