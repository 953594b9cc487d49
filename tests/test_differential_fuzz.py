"""Differential fuzzing: random queries from a safe grammar executed as
Spark DataFrame plans AND DuckDB SQL over the same parquet — results must
match exactly (sqllogictest-style, but generated).

Grammar keeps to the cross-engine parity rules (see queries/common.py):
integer/count aggregates, exact decimal sums, wall-clock time buckets.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

FILTERS = [
    # (spark column expr, sql predicate)
    (lambda: F.col("event_type") == "click", "event_type = 'click'"),
    (lambda: F.col("event_type") != "error", "event_type <> 'error'"),
    (lambda: F.col("value") > 50.0, "value > 50.0"),
    (lambda: F.col("value") <= 10.0, "value <= 10.0"),
    (lambda: F.col("user_id") % 3 == 0, "user_id % 3 = 0"),
    (lambda: F.col("event_id") % 7 < 3, "event_id % 7 < 3"),
    (lambda: F.col("ts") < "2024-01-15", "ts < timestamp '2024-01-15'"),
]

GROUPS = [
    ([], ""),
    (["event_type"], "event_type"),
    (["user_id"], "user_id"),
    (["event_type", "user_id"], "event_type, user_id"),
]

AGGS = [
    (lambda: F.count("*").alias("n"), "count(*) AS n"),
    (
        lambda: F.countDistinct("user_id").alias("n_users"),
        "count(DISTINCT user_id) AS n_users",
    ),
    (lambda: F.min("event_id").alias("min_id"), "min(event_id) AS min_id"),
    (lambda: F.max("value").alias("max_v"), "max(value) AS max_v"),
    (
        lambda: F.round(
            F.sum(F.col("value").cast("decimal(24,6)")).cast("double"), 4
        ).alias("sum_v"),
        "round(cast(sum(cast(value as decimal(24,6))) as double), 4) AS sum_v",
    ),
    (
        lambda: F.min(F.date_trunc("day", F.col("ts"))).alias("first_day"),
        "min(date_trunc('day', ts)) AS first_day",
    ),
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM parquet_scan('{SF_DIR}/events.parquet')"
    )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        else:
            df[c] = df[c].map(lambda v: "NULL" if pd.isna(v) else f"{v}")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    f_idx=st.lists(st.integers(0, len(FILTERS) - 1), max_size=2, unique=True),
    g_idx=st.integers(0, len(GROUPS) - 1),
    a_idx=st.lists(st.integers(0, len(AGGS) - 1), min_size=1, max_size=3, unique=True),
)
def test_random_query_differential(spark, duck, f_idx, g_idx, a_idx):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    preds_sql = []
    for i in f_idx:
        col, sql = FILTERS[i]
        ev = ev.filter(col())
        preds_sql.append(sql)
    group_cols, group_sql = GROUPS[g_idx]
    aggs = [AGGS[i][0]() for i in a_idx]
    aggs_sql = ", ".join(AGGS[i][1] for i in a_idx)
    if group_cols:
        got = ev.groupBy(*group_cols).agg(*aggs)
        select = f"{group_sql}, {aggs_sql}"
    else:
        got = ev.agg(*aggs)
        select = aggs_sql
    sql = f"SELECT {select} FROM events"
    if preds_sql:
        sql += " WHERE " + " AND ".join(preds_sql)
    if group_cols:
        sql += f" GROUP BY {group_sql}"
    want = duck.execute(sql).df()
    a = _canon(got.toPandas())
    b = _canon(want)
    pd.testing.assert_frame_equal(a, b)


# ---- join + window grammar -------------------------------------------------

JOIN_AGGS = [
    (lambda: F.count("*").alias("n"), "count(*) AS n"),
    (lambda: F.max("event_id").alias("max_id"), "max(event_id) AS max_id"),
    (
        lambda: F.round(
            F.sum(F.col("value").cast("decimal(24,6)")).cast("double"), 4
        ).alias("sum_v"),
        "round(cast(sum(cast(value as decimal(24,6))) as double), 4) AS sum_v",
    ),
]

WIN_EXPRS = [
    # total order via event_id tiebreak (oracle-parity rule)
    (
        lambda: F.row_number(),
        "row_number()",
    ),
    (
        lambda: F.lag("event_id"),
        "lag(event_id)",
    ),
    (
        lambda: F.sum(F.col("event_id")),
        "sum(event_id)",
    ),
]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    f_idx=st.integers(0, len(FILTERS) - 1),
    a_idx=st.lists(st.integers(0, len(JOIN_AGGS) - 1), min_size=1, max_size=2,
                   unique=True),
)
def test_random_broadcast_join_differential(spark, duck, f_idx, a_idx):
    """Fact-to-dim broadcast join: the dim is a distinct-user aggregate of
    the fact table itself, joined back and re-aggregated per bucket."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    col, pred_sql = FILTERS[f_idx]
    dim = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("user_events"))
        .withColumn("user_bucket", (F.col("user_events") % 5).cast("long"))
        .select("user_id", "user_bucket")
    )
    got = (
        ev.filter(col())
        .join(F.broadcast(dim), "user_id")
        .groupBy("user_bucket")
        .agg(*[JOIN_AGGS[i][0]() for i in a_idx])
    )
    aggs_sql = ", ".join(JOIN_AGGS[i][1] for i in a_idx)
    sql = f"""
    WITH dim AS (
      SELECT user_id, cast(count(*) % 5 AS bigint) AS user_bucket
      FROM events GROUP BY user_id
    )
    SELECT user_bucket, {aggs_sql}
    FROM events e JOIN dim USING (user_id)
    WHERE {pred_sql}
    GROUP BY user_bucket
    """
    pd.testing.assert_frame_equal(
        _canon(got.toPandas()), _canon(duck.execute(sql).df())
    )


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    w_idx=st.integers(0, len(WIN_EXPRS) - 1),
    f_idx=st.integers(0, len(FILTERS) - 1),
)
def test_random_window_differential(spark, duck, w_idx, f_idx):
    """Per-user ordered window with a TOTAL order (event_id tiebreak) —
    checked via an order-insensitive aggregate of the window output."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    col, pred_sql = FILTERS[f_idx]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfn, wsql = WIN_EXPRS[w_idx]
    got = (
        ev.filter(col())
        .withColumn("wv", wfn().over(w))
        .agg(
            F.count("wv").alias("n"),
            F.sum(F.col("wv").cast("decimal(24,6)")).cast("long").alias("s"),
        )
    )
    sql = f"""
    SELECT count(wv) AS n, cast(sum(cast(wv as decimal(24,6))) as bigint) AS s
    FROM (
      SELECT {wsql} OVER (PARTITION BY user_id ORDER BY ts, event_id) AS wv
      FROM events WHERE {pred_sql}
    )
    """
    pd.testing.assert_frame_equal(
        _canon(got.toPandas()), _canon(duck.execute(sql).df())
    )
