"""Golden-baseline regression workflow (SURVEY.md §2.9 V5, §5.2).

Reference analog: tools/compute_baseline.py freezes per-(car, signal)
counts/Hz/coverage; baseline_validator re-checks them within thresholds
after each stage (/root/reference/tools/compute_baseline.py:31-179,
/root/reference/src/validation/baseline_validator.py:124-479).

Here: ``compute_baseline`` aggregates per-(conv-bucket, role) stats off the
routed table into a ``baseline`` lake table; ``validate_against_baseline``
re-computes the same stats for a new routed table and joins them to the
stored baseline with tolerance verdicts (PASS/WARN/FAIL per metric), plus
an overall status row — a FAIL aborts the run upstream instead of
publishing drifted data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.lake import Lake


@dataclass(frozen=True)
class Tolerances:
    # reference: sample counts ±10%, coverage ±1%, presence ±5pp
    # (baseline_validator.py:124-210,213-270,301-387)
    count_rel: float = 0.10
    latency_rel: float = 0.25


def _stats(routed: DataFrame) -> DataFrame:
    """Per-(conv bucket, role) stats — the frozen shape."""
    bucket = F.substring("conv_id", 1, 9).alias("conv_bucket")  # conv-XXX*
    return routed.groupBy(bucket, "role").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.sum(F.col("parse_ok").cast("int")).alias("n_tool_calls"),
        F.sum(F.coalesce(F.col("latency_ms"), F.lit(0))).alias("sum_latency_ms"),
    )


def compute_baseline(lake: Lake, routed_table: str = "routed") -> str:
    routed = lake.read(routed_table)
    return lake.write(
        _stats(routed), "baseline", input_snapshot=lake.snapshot_id(routed_table) or ""
    )


def validate_against_baseline(
    lake: Lake,
    routed_table: str = "routed",
    tol: Tolerances = Tolerances(),
) -> tuple[DataFrame, bool]:
    """Returns (verdict table, overall_pass)."""
    actual = _stats(lake.read(routed_table))
    base = lake.read("baseline")
    a = actual.select(
        "conv_bucket",
        "role",
        F.col("n_rows").alias("a_rows"),
        F.col("n_tool_calls").alias("a_tools"),
        F.col("sum_latency_ms").alias("a_lat"),
    )
    b = base.select(
        "conv_bucket",
        "role",
        F.col("n_rows").alias("b_rows"),
        F.col("n_tool_calls").alias("b_tools"),
        F.col("sum_latency_ms").alias("b_lat"),
    )
    j = b.join(a, ["conv_bucket", "role"], "full_outer")

    def band(a_col: str, b_col: str, rel: float):
        return (
            F.when(F.col(b_col).isNull(), "NEW")
            .when(F.col(a_col).isNull(), "MISSING")
            .when(
                (F.col(a_col) >= (1 - rel) * F.col(b_col))
                & (F.col(a_col) <= (1 + rel) * F.col(b_col)),
                "PASS",
            )
            .otherwise("FAIL")
        )

    verdicts = j.withColumn(
        "rows_verdict", band("a_rows", "b_rows", tol.count_rel)
    ).withColumn("tools_verdict", band("a_tools", "b_tools", tol.count_rel)).withColumn(
        "latency_verdict", band("a_lat", "b_lat", tol.latency_rel)
    )
    lake.write(
        verdicts,
        "baseline_validation",
        input_snapshot=lake.snapshot_id(routed_table) or "",
    )
    n_fail = verdicts.filter(
        (F.col("rows_verdict") == "FAIL")
        | (F.col("tools_verdict") == "FAIL")
        | (F.col("latency_verdict") == "FAIL")
    ).count()
    return verdicts, n_fail == 0
