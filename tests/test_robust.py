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


def test_compare_drift_methods_matches_pandas(spark, raw_unit):
    """Reference compare_drift_methods analog: per-conv mean vs median vs
    huber over the inter-turn drift series, all three checked against an
    independent pandas/numpy computation."""
    from racing_telemetry_pipeline_spark.operators.drift import (
        compare_drift_methods,
    )

    from racing_telemetry_pipeline_spark.operators.dedup import (
        add_ingest_ordinal,
        dedup_keep_last,
    )

    # dedup first: duplicate (conv_id, turn_idx) keys would make the
    # window's tie order (and hence the diff series) nondeterministic
    raw = dedup_keep_last(
        add_ingest_ordinal(spark.read.parquet(raw_unit)), drop_ordinal=True
    )
    got = (
        compare_drift_methods(raw)
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    pdf = raw.select("conv_id", "turn_idx", "ts").toPandas()
    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="stable")
    checked = 0
    for conv, grp in pdf.groupby("conv_id"):
        dt = grp["ts"].astype("datetime64[us]").astype("int64").diff() / 1e6
        dt = dt.dropna().to_numpy()
        if len(dt) == 0:
            assert conv not in got.index
            continue
        row = got.loc[conv]
        assert row["n_samples"] == len(dt)
        assert row["drift_mean"] == pytest.approx(np.mean(dt), rel=1e-9)
        assert row["drift_median"] == pytest.approx(np.median(dt), rel=1e-9)
        if len(dt) > 1:
            assert row["drift_std"] == pytest.approx(np.std(dt, ddof=1), rel=1e-9)
        assert row["drift_huber"] == pytest.approx(_oracle(dt), abs=1e-9)
        checked += 1
    assert checked >= 40  # sf-unit has 50 conversations


def test_huber_downweights_outliers():
    base = np.full(99, 10.0) + np.linspace(-0.5, 0.5, 99)
    contaminated = np.concatenate([base, [1e6]])
    assert abs(huber_mean_np(contaminated) - 10.0) < 0.2
    assert abs(np.mean(contaminated) - 10.0) > 1000


def _fixed_oracle(values: np.ndarray, k: float = 1.345, iters: int = 8) -> float:
    # independent re-implementation of the FIXED-T unroll (pipe4's form)
    v = values[~np.isnan(values)]
    mu = np.median(v)
    scale = np.median(np.abs(v - mu)) * 1.4826
    if scale == 0:
        return float(mu)
    for _ in range(iters):
        w = np.clip((k * scale) / np.maximum(np.abs(v - mu), 1e-300), None, 1.0)
        mu = np.sum(w * v) / np.sum(w)
    return float(mu)


def test_huber_fixed_matches_numpy_twin(spark):
    """The Catalyst unrolled IRLS (pipe4's hash-gated form) reproduces an
    independent numpy unroll to float precision, group by group."""
    from racing_telemetry_pipeline_spark.functions.robust import huber_fixed

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = (
        huber_fixed(ev, ["event_type"], "value")
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    pdf = ev.select("event_type", "value").toPandas()
    checked = 0
    for et, grp in pdf.groupby("event_type"):
        want = _fixed_oracle(grp["value"].to_numpy())
        assert got.loc[et, "huber_mean"] == pytest.approx(want, rel=1e-9)
        checked += 1
    assert checked >= 3


def test_huber_fixed_close_to_converged_irls(spark):
    """Eight unrolled steps sit within ~1e-7 relative of the converged
    IRLS on realistic drift-like data (IRLS contracts ~10x per step) —
    the documented accuracy contract for swapping pipe4 from
    applyInPandas to the SQL-expressible form."""
    from racing_telemetry_pipeline_spark.functions.robust import huber_fixed

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    fixed = (
        huber_fixed(ev, ["event_type"], "value")
        .toPandas()
        .set_index("event_type")["huber_mean"]
    )
    pdf = ev.select("event_type", "value").toPandas()
    for et, grp in pdf.groupby("event_type"):
        converged = huber_mean_np(grp["value"].to_numpy())
        spread = grp["value"].std() or 1.0
        assert abs(fixed.loc[et] - converged) <= 1e-7 * spread + 1e-12


def test_huber_fixed_zero_scale_group(spark):
    """A constant-majority group (MAD == 0) pins to the median instead of
    emitting the 0/0 NaN of an all-zero weight vector."""
    from racing_telemetry_pipeline_spark.functions.robust import huber_fixed

    pdf = pd.DataFrame(
        {"g": ["a"] * 9 + ["b"] * 4,
         "x": [5.0] * 8 + [1e9] + [1.0, 2.0, 3.0, 4.0]}
    )
    got = (
        huber_fixed(spark.createDataFrame(pdf), ["g"], "x")
        .toPandas()
        .set_index("g")["huber_mean"]
    )
    assert got.loc["a"] == 5.0
    assert got.loc["b"] == pytest.approx(_fixed_oracle(np.array([1.0, 2.0, 3.0, 4.0])))
