"""Huber M-estimator (A2): applyInPandas operator vs independent numpy
oracle; robustness property vs the plain mean."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from racing_telemetry_pipeline_spark.functions.robust import (
    huber_by_group,
    huber_mean_np,
)


def _oracle(values: np.ndarray, k: float = 1.345) -> float:
    # independent re-implementation (same algorithm, written separately)
    v = values[~np.isnan(values)]
    mu = np.median(v)
    scale = np.median(np.abs(v - mu)) * 1.4826
    if scale == 0:
        return float(mu)
    for _ in range(50):
        r = v - mu
        w = np.clip((k * scale) / np.maximum(np.abs(r), 1e-300), None, 1.0)
        nxt = np.sum(w * v) / np.sum(w)
        if abs(nxt - mu) < 1e-9:
            return float(nxt)
        mu = nxt
    return float(mu)


def test_huber_by_group_matches_oracle(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = (
        huber_by_group(ev, ["event_type"], "value")
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    pdf = ev.select("event_type", "value").toPandas()
    for et, grp in pdf.groupby("event_type"):
        want = _oracle(grp["value"].to_numpy())
        assert got.loc[et, "huber_mean"] == pytest.approx(want, abs=1e-9)
        assert got.loc[et, "n"] == len(grp)


def test_huber_downweights_outliers():
    base = np.full(99, 10.0) + np.linspace(-0.5, 0.5, 99)
    contaminated = np.concatenate([base, [1e6]])
    assert abs(huber_mean_np(contaminated) - 10.0) < 0.2
    assert abs(np.mean(contaminated) - 10.0) > 1000
