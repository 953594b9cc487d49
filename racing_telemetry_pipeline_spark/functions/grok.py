"""Vectorized grok/regex field extraction from transcript ``text``.

Analog of the reference's vehicle-identity regex parse
(/root/reference/src/schemas/raw.py:21-44 — ``GR86-(\\d+)-(\\d+)`` with
UNKNOWN on failure, applied at /root/reference/src/ingestion/ingest.py:242-248).

Two interchangeable engines (results are asserted equal in tests):

- ``pandas_udf`` — Arrow-batched ``pandas_udf`` returning a struct, using
  ``Series.str.extract`` over whole batches: NO per-row Python. This is the
  engine the north rule mandates for the general grok case (arbitrary
  patterns, multi-field extraction).
- ``builtin`` — JVM-side ``regexp_extract`` expressions (whole-stage
  codegen); fastest when the pattern is fixed and simple.

Both produce the same columns:
  tool_name:string, args_bytes:bigint, latency_ms:bigint,
  event_kind:string, has_tool_markup:boolean, parse_ok:boolean
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOOL_CALL_PATTERN = r'<tool_call name="([a-z_]+)" args_bytes=(\d+) latency_ms=(-?\d+)/>'
EVENT_PATTERN = r"\[event:([a-z]+)\]"
_MARKUP_LITERAL = "<tool_call "
_EVENT_LITERAL = "[event:"

_PARSED_SCHEMA = T.StructType(
    [
        T.StructField("tool_name", T.StringType()),
        T.StructField("args_bytes", T.LongType()),
        T.StructField("latency_ms", T.LongType()),
        T.StructField("event_kind", T.StringType()),
        T.StructField("has_tool_markup", T.BooleanType()),
        T.StructField("parse_ok", T.BooleanType()),
    ]
)


@F.pandas_udf(_PARSED_SCHEMA)
def _grok_udf(text: pd.Series) -> pd.DataFrame:
    # one vectorized extract per Arrow batch — no per-row Python
    tc = text.str.extract(TOOL_CALL_PATTERN)
    ev = text.str.extract(EVENT_PATTERN)
    has_markup = text.str.contains(_MARKUP_LITERAL, regex=False).fillna(False)
    args_bytes = pd.to_numeric(tc[1], errors="coerce").astype("Int64")
    latency_ms = pd.to_numeric(tc[2], errors="coerce").astype("Int64")
    parse_ok = tc[0].notna() & args_bytes.notna() & latency_ms.notna()
    return pd.DataFrame(
        {
            "tool_name": tc[0],
            "args_bytes": args_bytes,
            "latency_ms": latency_ms,
            "event_kind": ev[0],
            "has_tool_markup": has_markup,
            "parse_ok": parse_ok.fillna(False),
        }
    )


def _nullif_empty(c: Column) -> Column:
    return F.when(c == "", None).otherwise(c)


def parse_text(df: DataFrame, text_col: str = "text", engine: str = "pandas_udf") -> DataFrame:
    """Add parsed tool-call/event columns to ``df``."""
    if engine == "pandas_udf":
        t = F.col(text_col)
        # JVM-side pre-mask: only rows that can possibly match either
        # pattern ship their bytes through Arrow — the rest cross as a
        # null bitmap (~1 bit/row instead of ~500 B/row). Both patterns
        # require a literal substring (the grok prefix "<tool_call " /
        # "[event:"), so contains() is a conservative superset: a masked
        # row's UDF output (all-null extract, has_tool_markup=False,
        # parse_ok=False) is exactly what the UDF returns for null input.
        # At 16 threads the Arrow round-trip of the full text column was
        # a top memory-bandwidth consumer of the parse stage; this cuts
        # its volume by the non-matching fraction (~70% on the transcript
        # corpus) while keeping the pandas/Arrow engine contract.
        interesting = F.coalesce(
            t.contains(_MARKUP_LITERAL) | t.contains(_EVENT_LITERAL),
            F.lit(False),
        )
        parsed = _grok_udf(F.when(interesting, t))
        df = df.withColumn("_parsed", parsed)
        for f in _PARSED_SCHEMA.fieldNames():
            df = df.withColumn(f, F.col(f"_parsed.{f}"))
        return df.drop("_parsed")
    if engine == "builtin":
        t = F.col(text_col)
        tool_name = _nullif_empty(F.regexp_extract(t, TOOL_CALL_PATTERN, 1))
        args_bytes = _nullif_empty(F.regexp_extract(t, TOOL_CALL_PATTERN, 2)).cast("long")
        latency_ms = _nullif_empty(F.regexp_extract(t, TOOL_CALL_PATTERN, 3)).cast("long")
        event_kind = _nullif_empty(F.regexp_extract(t, EVENT_PATTERN, 1))
        has_markup = F.coalesce(t.contains(_MARKUP_LITERAL), F.lit(False))
        parse_ok = tool_name.isNotNull() & args_bytes.isNotNull() & latency_ms.isNotNull()
        return (
            df.withColumn("tool_name", tool_name)
            .withColumn("args_bytes", args_bytes)
            .withColumn("latency_ms", latency_ms)
            .withColumn("event_kind", event_kind)
            .withColumn("has_tool_markup", has_markup)
            .withColumn("parse_ok", F.coalesce(parse_ok, F.lit(False)))
        )
    raise ValueError(f"unknown engine: {engine}")
