"""Policy compiler: yaml policy must reproduce the hardcoded route chain
and emit warn flags (V1-V4, reference validation_policy.yaml analog)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from racing_telemetry_pipeline_spark.config import DEFAULTS
from racing_telemetry_pipeline_spark.operators.routing import (
    compile_policy,
    load_policy,
    route_rows,
)
from racing_telemetry_pipeline_spark.plans.pipeline import _build_routed


def test_policy_equals_hardcoded(spark, raw_unit):
    base = _build_routed(spark, raw_unit, DEFAULTS, "builtin").drop("route", "reason")
    hard = route_rows(base).select("conv_id", "turn_idx", "route", "reason")
    pol = compile_policy(base, load_policy()).select(
        "conv_id", "turn_idx", "route", "reason"
    )
    a = hard.orderBy("conv_id", "turn_idx").toPandas()
    b = pol.orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_policy_warn_flags(spark, raw_unit):
    base = _build_routed(spark, raw_unit, DEFAULTS, "builtin").drop("route", "reason")
    pol = compile_policy(base, load_policy())
    assert "warn_slow_tool_call" in pol.columns
    assert "warn_long_gap" in pol.columns
    n_warn = pol.filter(F.col("warn_slow_tool_call")).count()
    assert n_warn > 0  # latency uniform 1..1999 => some > 1900
    # warn does not quarantine
    assert (
        pol.filter(F.col("warn_slow_tool_call") & (F.col("route") == "quarantine"))
        .filter(F.col("reason").isNull())
        .count()
        == 0
    )
