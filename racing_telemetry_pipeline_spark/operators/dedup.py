"""Order-dependent keep-last deduplication (SURVEY.md §2.3 D1/W13).

Reference semantics: drop duplicates on the natural key keeping the LAST
occurrence in file order (/root/reference/src/ingestion/anomalies.py:39-95;
1.82M of 11.5M rows dropped on Barber R1). pandas gets "file order" for
free; Spark does not — so the ingest ordinal is made explicit from parquet
``_metadata`` (file path + row index), which is deterministic for a fixed
file layout regardless of split planning (SURVEY.md §7.4 risk 1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

INGEST_FILE = "_ingest_file"
INGEST_POS = "_ingest_pos"


def add_ingest_ordinal(df: DataFrame) -> DataFrame:
    """Attach (file_path, row_index) ordinal columns from a file scan.

    Must be called on a DataFrame read directly from files (parquet/orc);
    ``_metadata`` is only available on file-source scans. For in-memory
    test DataFrames, supply the ordinal columns explicitly instead.
    """
    return df.withColumn(INGEST_FILE, F.col("_metadata.file_path")).withColumn(
        INGEST_POS, F.col("_metadata.row_index")
    )


def dedup_keep_last(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    ordinal_cols: Sequence[str] = (INGEST_FILE, INGEST_POS),
    drop_ordinal: bool = False,
    mode: str = "single_shuffle",
) -> DataFrame:
    """Keep the last occurrence per key by ingest ordinal.

    ``single_shuffle`` (default): window over ``keys[0]`` (conv_id) ordered
    by (turn_idx, ordinal); a row survives iff the NEXT row in that order
    has a different turn_idx — i.e. it is the max-ordinal occurrence of its
    key. This partitions by conv_id only, so every downstream per-conv
    window (anomaly flags, monotonic repair, latency lag) reuses the SAME
    exchange — the whole parse->sync chain plans exactly one shuffle, which
    at 10^12-row scale is the dominant cost.

    ``per_key``: classic row_number over partitionBy(*keys) — a second
    exchange, kept for comparison/benchmarks.
    """
    if mode == "single_shuffle":
        w = Window.partitionBy(keys[0]).orderBy(
            *[F.col(k) for k in keys[1:]], *[F.col(c) for c in ordinal_cols]
        )
        nxt = [F.lead(k).over(w) for k in keys[1:]]
        keep = F.lit(False)
        for k, n in zip(keys[1:], nxt):
            keep = keep | n.isNull() | (n != F.col(k))
        out = df.withColumn("_keep", keep).filter(F.col("_keep")).drop("_keep")
    elif mode == "per_key":
        w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in ordinal_cols])
        out = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        raise ValueError(f"unknown mode: {mode}")
    if drop_ordinal:
        out = out.drop(*ordinal_cols)
    return out
