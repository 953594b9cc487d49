"""Shared helpers for the driver-contract queries.

Oracle-parity rules used throughout (driver hashes values after sorting
columns by name):
- identical column aliases on both sides;
- float aggregates rounded the same on both sides (sum/avg -> 4 dp,
  percentile/ratio -> 6 dp); money-style sums go through an exact
  decimal(24,6) cast so the result is order-independent;
- DuckDB integer sums cast to BIGINT (DuckDB widens to HUGEINT);
- time arithmetic is wall-clock only (date_trunc / timestampdiff), never
  epoch, so results do not depend on the driver session's timezone or on
  TIMESTAMP vs TIMESTAMP_NTZ parquet inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dsum(col: str, alias: str, scale: int = 4):
    """Order-independent float sum: exact decimal accumulate, then double."""
    return F.round(
        F.sum(F.col(col).cast("decimal(24,6)")).cast("double"), scale
    ).alias(alias)


def dsum_sql(col: str, alias: str, scale: int = 4) -> str:
    return (
        f"round(cast(sum(cast({col} as decimal(24,6))) as double), {scale}) as {alias}"
    )


def davg(col: str, alias: str, scale: int = 4):
    """Order-independent mean: exact decimal sum -> double -> / count.

    Both engines then round the bit-identical double the same way.
    """
    return F.round(
        F.sum(F.col(col).cast("decimal(24,6)")).cast("double") / F.count(F.col(col)),
        scale,
    ).alias(alias)


def davg_sql(col: str, alias: str, scale: int = 4) -> str:
    return (
        f"round(cast(sum(cast({col} as decimal(24,6))) as double) / count({col}),"
        f" {scale}) as {alias}"
    )
