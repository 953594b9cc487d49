"""Edge inputs the generator never produces: null ts/text/role, empty
input, single-turn conversations — the pipeline must route, not crash."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from racing_telemetry_pipeline_spark.config import DEFAULTS
from racing_telemetry_pipeline_spark.datagen.dims import dim_roles_pdf, dim_tools_pdf
from racing_telemetry_pipeline_spark.functions.grok import parse_text
from racing_telemetry_pipeline_spark.operators.routing import apply_sentinels, route_rows
from racing_telemetry_pipeline_spark.operators.skew import salted_parse_sync

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("ordinal", T.LongType()),
    ]
)


def _route(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    df = salted_parse_sync(df, ordinal_cols=("ordinal",))
    df = apply_sentinels(parse_text(df, engine="pandas_udf"), DEFAULTS)
    dim_roles = F.broadcast(spark.createDataFrame(dim_roles_pdf()))
    dim_tools = F.broadcast(
        spark.createDataFrame(dim_tools_pdf()).withColumnRenamed("tool", "tool_key")
    )
    df = df.join(dim_roles, "role", "left")
    df = df.join(dim_tools, df.tool_name == dim_tools.tool_key, "left").drop("tool_key")
    return route_rows(df, DEFAULTS)


TS = datetime.datetime(2025, 1, 1, 0, 0, 0)


def test_null_ts_and_text_quarantine(spark):
    rows = [
        ("c1", 0, "user", "hello", "", TS, 0),
        ("c1", 1, "assistant", None, "", TS, 1),          # null text -> valid
        ("c1", 2, "tool", 'x <tool_call name="sql" args_bytes=1 latency_ms=2/>', "sql", None, 2),  # null ts
        ("c1", 3, None, "hi", "", TS, 3),                 # null role -> unknown_role
    ]
    out = {r["turn_idx"]: r for r in _route(spark, rows).collect()}
    assert out[0]["route"] == "valid"
    assert out[1]["route"] == "valid" and out[1]["parse_ok"] is False
    assert out[2]["route"] == "quarantine" and out[2]["reason"] == "null_ts"
    assert out[3]["route"] == "quarantine" and out[3]["reason"] == "unknown_role"


def test_empty_input(spark):
    out = _route(spark, [])
    assert out.count() == 0
    assert "route" in out.columns


def test_single_turn_conversations(spark):
    rows = [(f"c{i}", 0, "user", f"only turn {i}", "", TS, i) for i in range(5)]
    out = _route(spark, rows).collect()
    assert len(out) == 5
    for r in out:
        assert r["dt_sec"] is None
        assert r["segment_id"] == 0
        assert r["ts_sync"] == r["ts"]
        assert r["route"] == "valid"


def test_all_rows_duplicated(spark):
    rows = []
    for copy in range(3):
        rows += [("c1", i, "user", f"v{copy}-t{i}", "", TS, copy * 10 + i) for i in range(4)]
    out = _route(spark, rows).collect()
    assert len(out) == 4
    assert all(r["text"].startswith("v2-") for r in out)  # keep-last wins
