"""Per-conversation time-anomaly flags: backwards, gaps, segment ids.

Reference analogs (SURVEY.md §2.6 W1-W3):
- backwards detection: diff(ts) < -tol per car
  (/root/reference/src/utils/time_utils.py:69-90,
   /root/reference/src/ingestion/anomalies.py:98-155)
- gap detection: diff(ts) > 2.0 s
  (/root/reference/src/utils/time_utils.py:93-114)
- segment id = cumsum(is_gap | is_backwards)
  (/root/reference/src/utils/time_utils.py:136-153,
   /root/reference/src/transform/time_sync.py:154-196)

All three are one window pass over (conv_id ordered by turn_idx) — a single
shuffle shared with dedup's partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_time_flags(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    gap_threshold_sec: float = 2.0,
    backwards_tolerance_sec: float = 0.0,
) -> DataFrame:
    w = Window.partitionBy(conv_col).orderBy(order_col)
    # integer-microsecond subtraction BEFORE the divide: subtracting two
    # cast-to-double epochs loses ~1e-7 s at 2025 epochs (float64 ulp)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dt = (us - F.lag(us).over(w)) / F.lit(1_000_000.0)
    is_backwards = F.coalesce(dt < -backwards_tolerance_sec, F.lit(False))
    is_gap = F.coalesce(dt > gap_threshold_sec, F.lit(False))
    seg_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("dt_sec", dt)
        .withColumn("is_backwards", is_backwards)
        .withColumn("is_gap", is_gap)
        .withColumn(
            "segment_id",
            F.sum((is_backwards | is_gap).cast("int")).over(seg_w),
        )
    )
