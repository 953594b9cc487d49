"""Property-based tests (hypothesis) for the order-sensitive operators.

Random conversations with arbitrary timestamp pathologies must satisfy:
- monotonic repair output is non-decreasing and idempotent;
- keep-last dedup keeps exactly the max-ordinal row per key;
- salted (bucketed) sync == plain sync for ANY bucket width;
- segment ids equal the cumsum of boundary flags.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from racing_telemetry_pipeline_spark.operators.anomalies import add_time_flags
from racing_telemetry_pipeline_spark.operators.dedup import dedup_keep_last
from racing_telemetry_pipeline_spark.operators.drift import monotonic_repair
from racing_telemetry_pipeline_spark.operators.skew import salted_parse_sync


@st.composite
def conversations(draw):
    n_convs = draw(st.integers(1, 4))
    rows = []
    seq = 0
    for c in range(n_convs):
        n = draw(st.integers(1, 30))
        base = draw(st.integers(0, 10**6))
        for i in range(n):
            ts_us = (base + i) * 1_000_000 + draw(
                st.integers(-40_000_000, 40_000_000)
            )
            n_copies = draw(st.sampled_from([1, 1, 1, 2, 3]))
            for copy in range(n_copies):
                rows.append(
                    {
                        "conv_id": f"c{c}",
                        "turn_idx": i,
                        "text": f"v{copy}-c{c}-t{i}",
                        "ts": max(ts_us, 0),
                        "ordinal": seq,
                    }
                )
                seq += 1
    return pd.DataFrame(rows)


def _spark_df(spark, pdf):
    pdf = pdf.copy()
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us")
    return spark.createDataFrame(pdf)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(conversations())
def test_repair_and_dedup_properties(spark, pdf):
    df = _spark_df(spark, pdf)
    deduped = dedup_keep_last(df, ordinal_cols=("ordinal",))
    out = monotonic_repair(add_time_flags(deduped)).toPandas()
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # oracle: pandas keep-last by ordinal
    want = (
        pdf.sort_values("ordinal")
        .drop_duplicates(["conv_id", "turn_idx"], keep="last")
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert list(out["text"]) == list(want["text"])

    # ts_sync non-decreasing per conv, >= ts, idempotent
    for _, g in out.groupby("conv_id"):
        s = g["ts_sync"].to_numpy()
        assert (s[1:] >= s[:-1]).all()
        assert (g["ts_sync"] >= g["ts"]).all()
    # segment id == cumsum of flags
    flags = (out["is_backwards"] | out["is_gap"]).astype(int)
    want_seg = flags.groupby(out["conv_id"]).cumsum()
    assert (out["segment_id"] == want_seg).all()


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(conversations(), st.sampled_from([1, 2, 7, 32768]))
def test_salted_equals_plain_property(spark, pdf, bucket_turns):
    df = _spark_df(spark, pdf)
    cols = ["conv_id", "turn_idx", "text", "dt_sec", "is_backwards",
            "is_gap", "segment_id", "ts_sync"]
    plain = (
        monotonic_repair(
            add_time_flags(dedup_keep_last(df, ordinal_cols=("ordinal",)))
        )
        .select(*cols)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    salted = (
        salted_parse_sync(df, bucket_turns=bucket_turns, ordinal_cols=("ordinal",))
        .select(*cols)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    pd.testing.assert_frame_equal(salted, plain)
