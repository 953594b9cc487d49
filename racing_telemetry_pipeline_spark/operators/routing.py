"""Policy-driven row routing: valid / quarantine / tool_events fan-out.

This converts the reference's halt-semantics validation
(/root/reference/src/validation/validators.py:54-132, FAIL/WARN policy
/root/reference/src/conf/validation_policy.yaml:7-80) into row-routing
semantics (SURVEY.md §2.9 V4): every row gets exactly one ``route`` and
quarantined rows carry a ``reason`` code (mirroring the reference's audit
enums, /root/reference/src/schemas/metadata.py:9-17).

Routing precedence (first match wins):
  null_ts > unknown_role > malformed_tool_call > negative_latency >
  args_too_large > tool_events (parse_ok) > valid
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULTS, PipelineSettings

QUARANTINE_REASONS = (
    "null_ts",
    "unknown_role",
    "malformed_tool_call",
    "negative_latency",
    "args_too_large",
)


def apply_sentinels(df: DataFrame, settings: PipelineSettings = DEFAULTS) -> DataFrame:
    """Sentinel -> NULL (reference: lap 32768 -> NaN,
    /root/reference/src/transform/lap_repair.py:60-72)."""
    return df.withColumn(
        "latency_ms",
        F.when(F.col("latency_ms") == settings.latency_sentinel_ms, None).otherwise(
            F.col("latency_ms")
        ),
    )


def _route_expr(settings: PipelineSettings) -> tuple[Column, Column]:
    checks: list[tuple[Column, str]] = [
        (F.col("ts").isNull(), "null_ts"),
        (F.col("role_group").isNull(), "unknown_role"),
        (F.col("has_tool_markup") & ~F.col("parse_ok"), "malformed_tool_call"),
        (F.col("latency_ms") < 0, "negative_latency"),
        (F.col("args_bytes") > settings.max_args_bytes, "args_too_large"),
    ]
    reason = F.lit(None).cast("string")
    for cond, code in reversed(checks):
        reason = F.when(F.coalesce(cond, F.lit(False)), F.lit(code)).otherwise(reason)
    route = (
        F.when(reason.isNotNull(), F.lit("quarantine"))
        .when(F.col("parse_ok"), F.lit("tool_events"))
        .otherwise(F.lit("valid"))
    )
    return route, reason


def route_rows(df: DataFrame, settings: PipelineSettings = DEFAULTS) -> DataFrame:
    """Add ``route`` and ``reason`` columns (pure ``when`` chain, codegen'd)."""
    route, reason = _route_expr(settings)
    return df.withColumn("route", route).withColumn("reason", reason)
