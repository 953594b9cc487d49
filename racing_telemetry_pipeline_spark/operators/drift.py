"""Time-sync stage: monotonic timestamp repair + windowed drift calibration.

Reference analogs (SURVEY.md §2.5 A1-A3, §2.6 W4-W5, W11):
- 5-min tumbling drift windows with median/std/count per car
  (/root/reference/src/utils/time_utils.py:156-217,
   /root/reference/src/transform/drift.py:49-119)
- clock-step detection: window flagged if drift_std > 3 x median(drift_std)
  (/root/reference/src/utils/time_utils.py:220-240)
- drift application producing corrected timestamps
  (/root/reference/src/transform/drift.py:122-163)
- post-repair monotonicity re-check, target 0 backwards
  (/root/reference/src/transform/time_sync.py:241-249)

For transcripts the idiomatic correction (SURVEY.md §2.6 W4 note) is the
running-max repair: ``ts_sync = max(ts) over (partition by conv_id order by
turn_idx rows unbounded preceding)`` — monotone by construction, identity on
clean conversations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def monotonic_repair(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    out_col: str = "ts_sync",
) -> DataFrame:
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.max(ts_col).over(w))


def drift_calibration(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    window_sec: int = 300,
    step_std_factor: float = 3.0,
    dt_col: str | None = None,
    approx: bool = False,
) -> DataFrame:
    """Per-(conv, tumbling window) drift stats over inter-turn deltas.

    drift series = diff(ts) in seconds (negative = backwards clock);
    window key = floor(epoch(ts)/window)*window so a SQL oracle can
    reproduce it exactly. Emits median/mean/std/count per window plus a
    step_detected flag (std > factor x per-conv median of window stds).

    Pass ``dt_col`` when the input already carries the per-turn delta
    (e.g. the routed table's ``dt_sec`` from add_time_flags) — the stage
    then plans as a pure aggregation with NO window shuffle over the raw
    table, which is what lets the aggregate stages scale (see bench).

    ``approx=True`` swaps the exact medians for ``percentile_approx``
    (same at-scale contract as the other aggregate tables; exact is the
    test-scale / oracle configuration). The exact percentile is an
    object-hash aggregate that buffers each group's deltas — fine for
    bounded (conv, 5-min window) groups, but measurably slower per row.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    if dt_col is None:
        w = Window.partitionBy(conv_col).orderBy(order_col)
        dt = (us - F.lag(us).over(w)) / F.lit(1_000_000.0)
    else:
        dt = F.col(dt_col)
    # integer division for exact window binning at boundaries
    win = (us - F.pmod(us, F.lit(window_sec * 1_000_000))) / F.lit(1_000_000)
    win = win.cast("long")
    med = (
        F.percentile_approx("_dt", 0.5)
        if approx
        else F.expr("percentile(_dt, 0.5)")
    )
    per_win = (
        df.withColumn("_dt", dt)
        .withColumn("win_start", win)
        .filter(F.col("_dt").isNotNull())
        .groupBy(conv_col, "win_start")
        .agg(
            med.alias("drift_median"),
            F.avg("_dt").alias("drift_mean"),
            F.stddev("_dt").alias("drift_std"),
            F.count("*").alias("n_samples"),
        )
    )
    std_med = (
        F.percentile_approx("drift_std", 0.5)
        if approx
        else F.expr("percentile(drift_std, 0.5)")
    )
    conv_med = Window.partitionBy(conv_col)
    return per_win.withColumn(
        "step_detected",
        F.coalesce(
            F.col("drift_std") > step_std_factor * std_med.over(conv_med),
            F.lit(False),
        ),
    )


def compare_drift_methods(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    dt_col: str | None = None,
    method: str = "irls",
) -> DataFrame:
    """Per-conversation drift estimate by three methods side-by-side:
    mean, median, and Huber M-estimate (reference:
    /root/reference/src/transform/drift.py:229-264 compare_drift_methods).

    mean/median/std/count stay pure Catalyst. The Huber column has two
    engines: ``method="irls"`` runs the convergence-based IRLS in the
    existing applyInPandas operator; ``method="fixed"`` runs the
    fixed-iteration unrolled IRLS as pure Catalyst CTEs
    (functions/robust.huber_fixed) — SQL-expressible, so the driver's
    DuckDB hash gate covers it (the two agree to ~1e-6 on realistic
    drift; asserted in tests/test_robust.py). Both branches aggregate on
    conv_col, so the join is co-partitioned — no extra full-width shuffle
    beyond the aggregations themselves.
    """
    from ..functions.robust import huber_by_group, huber_fixed

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    if dt_col is None:
        w = Window.partitionBy(conv_col).orderBy(order_col)
        dt = (us - F.lag(us).over(w)) / F.lit(1_000_000.0)
    else:
        dt = F.col(dt_col)
    drift = df.withColumn("_dt", dt).filter(F.col("_dt").isNotNull())
    basic = drift.groupBy(conv_col).agg(
        F.avg("_dt").alias("drift_mean"),
        F.expr("percentile(_dt, 0.5)").alias("drift_median"),
        F.stddev("_dt").alias("drift_std"),
        F.count("*").alias("n_samples"),
    )
    if method == "fixed":
        huber = huber_fixed(drift, [conv_col], "_dt").withColumnRenamed(
            "huber_mean", "drift_huber"
        )
    else:
        huber = huber_by_group(drift, [conv_col], "_dt").withColumnRenamed(
            "huber_mean", "drift_huber"
        ).drop("n")
    return basic.join(huber, conv_col)


def count_backwards(df: DataFrame, conv_col: str, order_col: str, ts_col: str) -> int:
    """Post-repair monotonicity re-check (north-star invariant: 0)."""
    w = Window.partitionBy(conv_col).orderBy(order_col)
    flag = F.coalesce(F.col(ts_col) < F.lag(ts_col).over(w), F.lit(False))
    row = (
        df.withColumn("_bw", flag.cast("int"))
        .select(F.sum("_bw").alias("n"))
        .collect()[0]
    )
    return int(row["n"] or 0)
