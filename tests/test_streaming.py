"""Structured Streaming pipeline: memory-sink smoke + equivalence of the
stateless stages with the batch path."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from racing_telemetry_pipeline_spark.streaming import (
    streaming_route,
    streaming_tool_stats,
)


def test_streaming_route_counts(spark, raw_unit, oracle_unit):
    routed = streaming_route(spark, raw_unit)
    q = (
        routed.writeStream.outputMode("append")
        .format("memory")
        .queryName("routed_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.sql("SELECT route, count(*) AS n FROM routed_stream GROUP BY route")
        .toPandas()
        .set_index("route")["n"]
        .sort_index()
    )
    # dropDuplicatesWithinWatermark dedups by key but keeps the FIRST
    # arrival, not the ingest-last — text-level equality is a batch
    # guarantee; routed key-counts must still match the oracle exactly
    want = (
        oracle_unit["routed"].groupby("route").size().sort_index()
    )
    assert got.to_dict() == want.to_dict()


def test_streaming_windowed_tool_stats(spark, raw_unit):
    routed = streaming_route(spark, raw_unit)
    agg = streaming_tool_stats(routed, window="5 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tool_stats_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pdf = spark.sql("SELECT * FROM tool_stats_stream").toPandas()
    assert len(pdf) > 0
    assert (pdf["n_calls"] > 0).all()
    assert {"win", "tool_name", "n_calls", "avg_latency_ms"} <= set(pdf.columns)


def test_stateful_conversation_tracker(spark, raw_unit, oracle_unit):
    from pyspark.sql import functions as F
    from racing_telemetry_pipeline_spark.streaming.stream_pipeline import (
        RAW_SCHEMA,
        conversation_tracker,
    )

    raw = (
        spark.readStream.schema(RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(raw_unit)
    )
    tracked = conversation_tracker(raw)
    q = (
        tracked.writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_state")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # latest state per conv == batch ground truth over RAW (incl. dups)
    got = (
        spark.sql(
            """SELECT conv_id, max(n_turns) AS n_turns,
                      max(n_tool_turns) AS n_tool
               FROM conv_state GROUP BY conv_id"""
        )
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    batch = spark.read.parquet(raw_unit)
    want = (
        batch.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum((F.col("role") == "tool").cast("long")).alias("n_tool"),
        )
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    assert got["n_turns"].to_dict() == want["n_turns"].to_dict()
    assert got["n_tool"].to_dict() == want["n_tool"].to_dict()
