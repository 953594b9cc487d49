"""Golden-baseline regression workflow (V5) + schema contracts (S2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from racing_telemetry_pipeline_spark.plans.baseline import (
    compute_baseline,
    validate_against_baseline,
)
from racing_telemetry_pipeline_spark.plans.pipeline import run_pipeline
from racing_telemetry_pipeline_spark.schemas import (
    SchemaContractError,
    validate_raw,
)
from racing_telemetry_pipeline_spark.sources.lake import Lake


@pytest.fixture(scope="module")
def lake(spark, raw_unit, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lake_base"))
    run_pipeline(spark, raw_unit, root)
    return Lake(spark, root)


def test_baseline_self_validation_passes(spark, lake):
    compute_baseline(lake)
    verdicts, ok = validate_against_baseline(lake)
    assert ok
    pdf = verdicts.toPandas()
    assert (pdf["rows_verdict"] == "PASS").all()
    assert (pdf["tools_verdict"] == "PASS").all()
    assert (pdf["latency_verdict"] == "PASS").all()
    # persisted as a lake table
    assert lake.read("baseline_validation").count() == len(pdf)


def test_baseline_detects_regression(spark, lake, raw_unit, tmp_path):
    """Dropping half the data must FAIL the count bands."""
    compute_baseline(lake)
    root2 = str(tmp_path / "lake_broken")
    lake2 = Lake(spark, root2)
    broken = lake.read("routed").sample(0.4, seed=1)
    lake2.write(broken, "routed", input_snapshot="broken")
    # validator compares lake2's routed stats against lake's baseline
    lake2.write(lake.read("baseline"), "baseline", input_snapshot="copy")
    verdicts, ok = validate_against_baseline(lake2)
    assert not ok
    assert verdicts.filter(F.col("rows_verdict") == "FAIL").count() > 0


def test_schema_contract_rejects_bad_raw(spark, raw_unit):
    good = spark.read.parquet(raw_unit)
    validate_raw(good)  # no raise
    with pytest.raises(SchemaContractError, match="missing columns"):
        validate_raw(good.drop("role"))
    with pytest.raises(SchemaContractError, match="type mismatch"):
        validate_raw(good.withColumn("turn_idx", F.col("turn_idx").cast("long")))
    with pytest.raises(SchemaContractError, match="timestamp"):
        validate_raw(good.withColumn("ts", F.col("ts").cast("string")))
