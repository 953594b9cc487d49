"""Robust location estimators (SURVEY.md §2.5 A2).

Reference analog: Huber M-estimator with MAD scale for drift estimation
(/root/reference/src/transform/drift.py:197-226). The median path needs no
UDF (exact ``percentile``); the Huber estimator is iterative per group, so
it runs as an ``applyInPandas`` grouped-map — the second (and last)
justified Python stage in the engine, Arrow-batched, vectorized numpy
inside.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def huber_mean_np(x: np.ndarray, k: float = 1.345, iters: int = 50,
                  tol: float = 1e-9) -> float:
    """Huber M-estimate of location with MAD scale (IRLS)."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    if len(x) == 0:
        return float("nan")
    mu = float(np.median(x))
    mad = float(np.median(np.abs(x - mu))) * 1.4826
    if mad == 0.0:
        return mu
    for _ in range(iters):
        r = x - mu
        w = np.minimum(1.0, (k * mad) / np.maximum(np.abs(r), 1e-300))
        mu_new = float(np.sum(w * x) / np.sum(w))
        if abs(mu_new - mu) < tol:
            return mu_new
        mu = mu_new
    return mu


def huber_fixed_np(x: np.ndarray, k: float = 1.345, iters: int = 8) -> float:
    """Numpy twin of ``huber_fixed`` (same FIXED unrolled step count, same
    guards) — the independent oracle for the Catalyst spelling."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    if len(x) == 0:
        return float("nan")
    mu = float(np.median(x))
    scale = float(np.median(np.abs(x - mu))) * 1.4826
    if scale == 0.0:
        return mu
    for _ in range(iters):
        w = np.minimum(1.0, (k * scale) / np.maximum(np.abs(x - mu), 1e-300))
        mu = float(np.sum(w * x) / np.sum(w))
    return mu


def huber_fixed(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 1.345,
    iters: int = 8,
) -> DataFrame:
    """Huber location by a FIXED, unrolled number of IRLS reweight steps —
    pure Catalyst, hence SQL-expressible: the DuckDB oracle mirrors the
    exact same chain of CTEs, which is what lets the driver's hash gate
    cover the robust estimator end-to-end (same technique as sim9's two
    unrolled Lloyd iterations, queries/similarity.py).

    Seed mu0 = exact median; scale = MAD * 1.4826; each unrolled step
    reweights w = least(1, k*scale / greatest(|x - mu|, 1e-300)) and sets
    mu <- sum(w*x)/sum(w). IRLS contracts ~10x per step on realistic
    drift data, so the default T=8 is converged to ~1e-9 relative (pinned
    in tests/test_robust.py). A zero scale (constant-majority group) pins mu
    to the median at every step — identical to converged IRLS, and it
    keeps the 0/0 NaN of an all-zero weight vector out of the result.

    Scale shape: the per-group stats side is one row per group; each step
    joins it back to the values. The values' hash partitioning on the
    group key is planned once and reused across the unrolled steps
    (ReusedExchange), so the chain costs T+2 aggregations over co-located
    data, not T+2 full shuffles. The converged-IRLS variant stays
    available as ``huber_by_group`` (applyInPandas) for callers that want
    tolerance-based convergence over a fixed step count.

    Reference analog: /root/reference/src/transform/drift.py:197-226
    (Huber M-estimator with MAD scale)."""
    from pyspark.sql import functions as F

    vals = df.select(
        *group_cols, F.col(value_col).alias("_x")
    ).filter(F.col("_x").isNotNull())
    seed = vals.groupBy(*group_cols).agg(
        F.expr("percentile(_x, 0.5)").alias("_mu0")
    )
    scale = (
        vals.join(seed, list(group_cols))
        .groupBy(*group_cols)
        .agg(
            (F.expr("percentile(abs(_x - _mu0), 0.5)") * F.lit(1.4826)).alias(
                "_scale"
            ),
            F.first("_mu0").alias("_mu0"),
        )
    )
    cur, mu_col = scale, "_mu0"
    for i in range(iters):
        joined = vals.join(cur, list(group_cols))
        w = F.least(
            F.lit(1.0),
            (F.lit(k) * F.col("_scale"))
            / F.greatest(F.abs(F.col("_x") - F.col(mu_col)), F.lit(1e-300)),
        )
        nxt = f"_mu{i + 1}"
        cur = (
            joined.groupBy(*group_cols)
            .agg(
                (F.sum(w * F.col("_x")) / F.sum(w)).alias("_raw"),
                F.first("_mu0").alias("_mu0"),
                F.first("_scale").alias("_scale"),
            )
            .withColumn(
                nxt,
                F.when(F.col("_scale") == 0.0, F.col("_mu0")).otherwise(
                    F.col("_raw")
                ),
            )
            .drop("_raw")
        )
        mu_col = nxt
    return cur.select(*group_cols, F.col(mu_col).alias("huber_mean"))


def huber_by_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 1.345,
) -> DataFrame:
    """groupBy(group_cols) -> (group_cols..., huber_mean double, n long)."""
    out_schema = ", ".join(
        f"{c} {dict(df.dtypes)[c]}" for c in group_cols
    ) + ", huber_mean double, n long"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            [{**keys, "huber_mean": huber_mean_np(vals, k=k), "n": len(vals)}]
        )

    return df.groupBy(*group_cols).applyInPandas(fn, schema=out_schema)
