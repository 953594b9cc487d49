"""Declared schema contracts + enforcement (SURVEY.md §1.3, §2.1 S2).

Reference analog: Pydantic models (/root/reference/src/schemas/raw.py:47-111)
with required-column checks at ingest (/root/reference/src/ingestion/
ingest.py:214-215). Spark-native form: ``StructType`` contracts checked at
stage boundaries; read paths can pass the contract to ``spark.read.schema``
so enforcement is free at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

RAW_REQUIRED = {
    "conv_id": T.StringType(),
    "turn_idx": T.IntegerType(),
    "role": T.StringType(),
    "text": T.StringType(),
    "tool": T.StringType(),
}
RAW_TS_TYPES = (T.TimestampType, T.TimestampNTZType)

ROUTED_REQUIRED_COLS = [
    "conv_id", "turn_idx", "role", "text", "ts", "ts_sync",
    "dt_sec", "is_backwards", "is_gap", "segment_id",
    "tool_name", "args_bytes", "latency_ms", "parse_ok",
    "role_group", "route", "reason",
]


class SchemaContractError(ValueError):
    pass


def validate_raw(df: DataFrame) -> DataFrame:
    fields = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in RAW_REQUIRED if c not in fields]
    if missing:
        raise SchemaContractError(f"raw table missing columns: {missing}")
    wrong = [
        c for c, t in RAW_REQUIRED.items() if fields[c] != t
    ]
    if wrong:
        raise SchemaContractError(
            f"raw column type mismatch: "
            f"{[(c, str(fields[c])) for c in wrong]}"
        )
    if "ts" not in fields or not isinstance(fields["ts"], RAW_TS_TYPES):
        raise SchemaContractError(f"ts must be a timestamp, got {fields.get('ts')}")
    return df


def validate_routed(df: DataFrame) -> DataFrame:
    missing = [c for c in ROUTED_REQUIRED_COLS if c not in df.columns]
    if missing:
        raise SchemaContractError(f"routed table missing columns: {missing}")
    return df
