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


def load_policy(path: str | None = None) -> dict:
    """Load the declarative routing policy (reference analog:
    /root/reference/src/conf/validation_policy.yaml:7-80)."""
    import os

    import yaml

    if path is None:
        path = os.path.join(os.path.dirname(__file__), "..", "conf", "policy.yaml")
    with open(path) as fh:
        return yaml.safe_load(fh)


def compile_policy(df: DataFrame, policy: dict) -> DataFrame:
    """Compile a policy dict into route/reason/warn columns.

    Each check is one SQL boolean expression; ``fail`` checks chain into
    the quarantine reason (list order = precedence, first match wins),
    ``warn`` checks become ``warn_<reason>`` boolean columns. Everything
    stays a Catalyst ``when`` chain — no Python in the row path.
    """
    reason = F.lit(None).cast("string")
    for chk in reversed([c for c in policy["checks"] if c["severity"] == "fail"]):
        cond = F.coalesce(F.expr(chk["when"]), F.lit(False))
        reason = F.when(cond, F.lit(chk["reason"])).otherwise(reason)
    for chk in [c for c in policy["checks"] if c["severity"] == "warn"]:
        df = df.withColumn(
            f"warn_{chk['reason']}",
            F.coalesce(F.expr(chk["when"]), F.lit(False)),
        )
    tool_when = F.coalesce(F.expr(policy["routes"]["tool_events"]), F.lit(False))
    route = (
        F.when(reason.isNotNull(), F.lit("quarantine"))
        .when(tool_when, F.lit("tool_events"))
        .otherwise(F.lit(policy["routes"]["default"]))
    )
    return df.withColumn("route", route).withColumn("reason", reason)
