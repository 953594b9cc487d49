"""AQE runtime behaviors the 100 TB sizing relies on, demonstrated live:
skewed-join splitting and shuffle-partition coalescing. These complement
the salted-window path (tests/test_skew.py) — windows need manual salting,
but plain joins lean on AQE, and this proves the lean is real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skew_session(spark):
    """Tighten AQE thresholds so sandbox-sized data triggers the same
    runtime re-planning a hot key triggers at cluster scale."""
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(skew_session):
    spark = skew_session
    # fact: 200k rows, 90% on one hot key; dim: 5k distinct keys
    fact = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 5000)
        .alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("pl"),
    )
    dim = spark.range(5000).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("dv")
    )
    joined = fact.join(dim, "k")
    # collect() executes THIS DataFrame's own QueryExecution — count()
    # would build a separate one and the inspected adaptive plan would
    # never finalize
    rows = joined.collect()
    assert len(rows) == 200_000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]


def test_aqe_coalesces_small_partitions(skew_session):
    spark = skew_session
    out = (
        spark.range(10_000)
        .groupBy((F.col("id") % 97).alias("g"))
        .agg(F.count("*").alias("n"))
    )
    assert len(out.collect()) == 97
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan[:2000]
