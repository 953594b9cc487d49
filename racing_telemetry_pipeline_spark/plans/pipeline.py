"""End-to-end transcript pipeline plan:

  parse -> time-sync -> enrich -> route -> aggregate

Spark re-expression of the reference's canonical entry point
(/root/reference/examples/run_full_pipeline.py:196-419, traced in
SURVEY.md §3): the reference's sequential per-car loop becomes
``Window.partitionBy(conv_id)`` across executors; its per-stage parquet
materialization becomes coarse lake tables (resume points); its stats JSON
files become per-stage metrics + per-partition lineage tables.

Single-shuffle design note: dedup, time flags, monotonic repair and the
latency window all partition by ``conv_id`` — Catalyst plans ONE exchange
for the whole parse->sync chain (dedup's (conv_id, turn_idx) hash
partitioning does not satisfy window-by-conv_id, so the windows share a
second exchange; see tests/test_plans.py for the assertion that there are
exactly two). Dimension joins are broadcast; no other exchange exists
before the sink write.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULTS, PipelineSettings
from ..datagen.dims import dim_roles_pdf, dim_tools_pdf
from ..functions.grok import parse_text
from ..operators.aggregates import (
    role_latency_percentiles,
    sink_row_counts,
    tool_call_frequency,
    turns_per_conversation,
)
from ..operators.anomalies import add_time_flags
from ..operators.dedup import add_ingest_ordinal, dedup_keep_last
from ..operators.drift import drift_calibration, monotonic_repair
from ..operators.routing import apply_sentinels, route_rows
from ..sources.lake import Lake


@dataclass
class PipelineResult:
    lake_root: str
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)
    timings: dict[str, float] = field(default_factory=dict)
    input_snapshot: str = ""


def _build_routed(
    spark: SparkSession,
    raw_path: str,
    settings: PipelineSettings,
    parse_engine: str,
) -> DataFrame:
    """The fused parse->sync->enrich->route logical plan (lazy)."""
    raw = spark.read.parquet(raw_path)

    # parse stage: ingest ordinal -> keep-last dedup -> grok parse -> sentinels
    df = add_ingest_ordinal(raw)
    df = dedup_keep_last(df, drop_ordinal=True)
    df = parse_text(df, engine=parse_engine)
    df = apply_sentinels(df, settings)

    # time-sync stage: anomaly flags + monotonic repair (windows by conv_id)
    df = add_time_flags(
        df,
        gap_threshold_sec=settings.gap_threshold_sec,
        backwards_tolerance_sec=settings.backwards_tolerance_sec,
    )
    df = monotonic_repair(df)

    # enrich stage: broadcast dimension joins (J1 analog)
    dim_roles = F.broadcast(spark.createDataFrame(dim_roles_pdf()))
    dim_tools = F.broadcast(
        spark.createDataFrame(dim_tools_pdf()).withColumnRenamed("tool", "tool_key")
    )
    df = df.join(dim_roles, on="role", how="left")
    df = df.join(dim_tools, df.tool_name == dim_tools.tool_key, how="left").drop(
        "tool_key"
    )

    # route stage: policy predicates -> route/reason columns
    return route_rows(df, settings)


def run_pipeline(
    spark: SparkSession,
    raw_path: str,
    lake_root: str,
    settings: PipelineSettings = DEFAULTS,
    parse_engine: str = "pandas_udf",
    resume: bool = True,
    stop_after: str | None = None,
    approx_percentiles: bool = False,
) -> PipelineResult:
    """Run (or resume) the full pipeline; each lake table is a resume point.

    ``resume=True`` skips any stage whose output manifest records the same
    input snapshot (Iceberg-snapshot semantics over the parquet lake).
    ``stop_after`` simulates a mid-run failure for resume tests.
    """
    lake = Lake(spark, lake_root)
    res = PipelineResult(lake_root=lake_root)
    res.input_snapshot = lake.fingerprint_input(raw_path)

    def stage(name: str, fn, input_snapshot: str, tables: list[str]) -> bool:
        if resume and lake.stage_current(name, input_snapshot):
            res.stages_skipped.append(name)
            return False
        t0 = time.perf_counter()
        fn()
        lake.mark_stage(name, input_snapshot, tables)
        res.timings[name] = time.perf_counter() - t0
        res.stages_run.append(name)
        return True

    # -- stage 1-4 fused: routed table (partitioned by route = the fan-out) --
    def build_routed():
        routed = _build_routed(spark, raw_path, settings, parse_engine)
        lake.write(
            routed,
            "routed",
            partition_by=["route"],
            input_snapshot=res.input_snapshot,
            sort_within=["conv_id", "turn_idx"],
        )
        _write_lineage(spark, lake, "routed", res.input_snapshot)

    stage(
        "routed",
        build_routed,
        res.input_snapshot,
        ["routed", "lineage_routed", "metrics_routed"],
    )
    if stop_after == "routed":
        return res
    routed_snapshot = lake.snapshot_id("routed") or ""

    # -- drift-calibration audit table (A1-A3 analog) --
    def build_drift():
        raw = dedup_keep_last(add_ingest_ordinal(spark.read.parquet(raw_path)))
        cal = drift_calibration(
            raw,
            window_sec=settings.drift_window_sec,
            step_std_factor=settings.step_std_factor,
        )
        lake.write(cal, "drift_calibration", input_snapshot=res.input_snapshot)

    stage("drift_calibration", build_drift, res.input_snapshot, ["drift_calibration"])
    if stop_after == "drift_calibration":
        return res

    # -- aggregate stage: per-sink tables from the routed lake table --
    def build_aggs():
        routed = lake.read("routed")
        lake.write(
            sink_row_counts(routed), "agg_sink_counts", input_snapshot=routed_snapshot
        )
        lake.write(
            turns_per_conversation(routed),
            "agg_turns_per_conversation",
            input_snapshot=routed_snapshot,
        )
        lake.write(
            tool_call_frequency(routed, approx=approx_percentiles),
            "agg_tool_frequency",
            input_snapshot=routed_snapshot,
        )
        lake.write(
            role_latency_percentiles(routed, approx=approx_percentiles),
            "agg_role_latency",
            input_snapshot=routed_snapshot,
        )

    stage(
        "aggregates",
        build_aggs,
        routed_snapshot,
        [
            "agg_sink_counts",
            "agg_turns_per_conversation",
            "agg_tool_frequency",
            "agg_role_latency",
        ],
    )
    return res


def _write_lineage(
    spark: SparkSession, lake: Lake, stage_name: str, input_snapshot: str
) -> None:
    """Per-partition lineage rows + stage metrics (north rule requirement).

    Reference analog: per-stage stats parquet/JSON
    (/root/reference/src/transform/sync.py:375-439,
     /root/reference/src/ingestion/ingest.py:268-299).
    """
    df = lake.read(stage_name)
    lineage = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("conv_id").alias("min_conv_id"),
            F.max("conv_id").alias("max_conv_id"),
        )
        .withColumn("stage", F.lit(stage_name))
        .withColumn("input_snapshot", F.lit(input_snapshot))
    )
    lake.write(lineage, f"lineage_{stage_name}", input_snapshot=input_snapshot)
    metrics = df.groupBy("route").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.sum(F.col("is_backwards").cast("int")).alias("n_backwards_raw"),
        F.sum(F.col("is_gap").cast("int")).alias("n_gaps"),
    )
    lake.write(metrics, f"metrics_{stage_name}", input_snapshot=input_snapshot)
