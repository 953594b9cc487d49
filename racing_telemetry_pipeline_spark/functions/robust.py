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
