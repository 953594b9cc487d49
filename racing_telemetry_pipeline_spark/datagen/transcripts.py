"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Produces the raw input table ``(conv_id, turn_idx, role, text, tool, ts)``
in an explicit *ingest order* (row position in the written files), with the
Barber-R1-profile pathologies injected at fixed seeded rates:

- ~16% duplicate ``(conv_id, turn_idx)`` rows whose earlier copies carry
  stale text — keep-LAST must win (reference dedup:
  /root/reference/src/ingestion/anomalies.py:39-70; observed dup rate
  /root/reference/data/processed/barber_r1/ingestion_stats.json:6-7).
- backwards timestamps on ~10% of turns in ~90% of conversations
  (reference: 1.05M backwards ts on 18/20 cars,
  DATA_QUALITY_REPORT_BARBER_R1.md:86-113); ~10% of conversations clean.
- sparse time gaps > 2 s (reference: 71 gaps, ingestion_stats.json:30).
- sentinel latency_ms=32768 (reference lap sentinel:
  src/transform/lap_repair.py:15), malformed tool-call markup (~3% of tool
  turns), negative latencies, unknown roles.
- 1-3 "hot" conversations each holding ~5% of all turns (skew testing).

Everything is vectorized numpy/pandas — generation of the 8M-turn bench
scale takes seconds. The SAME arrays drive the pandas oracle, so oracle
and pipeline read identical bytes from disk.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..config import SCALES, Scale
from .dims import TOOLS

_FILLERS = [
    "let me look into that for you",
    "here is the result of the previous step",
    "considering the constraints we should proceed",
    "the output indicates a possible issue",
    "summarizing the findings so far",
    "requesting additional context from the user",
    "the plan needs a small adjustment",
    "confirming the action completed successfully",
]

_EVENT_KINDS = ["retry", "timeout", "handoff", "escalation"]

_ROLES = np.array(["user", "assistant", "tool", "system"])

BASE_EPOCH = pd.Timestamp("2025-01-01 00:00:00").value // 10**9  # UTC seconds


def _conv_lengths(scale: Scale, rng: np.random.Generator) -> np.ndarray:
    base = 5 + rng.geometric(1.0 / max(scale.mean_turns - 5, 1), scale.n_convs)
    base = np.minimum(base, scale.mean_turns * 8)
    total = int(base.sum())
    hot_len = max(int(0.05 * total), base.max() + 1)
    base[: scale.n_hot] = hot_len
    return base.astype(np.int64)


def generate_transcripts(scale_name: str = "sf-unit", seed: int = 42) -> pd.DataFrame:
    """Return the raw transcript table as a pandas DataFrame in ingest order."""
    scale = SCALES[scale_name]
    rng = np.random.default_rng(seed)

    lengths = _conv_lengths(scale, rng)
    n = int(lengths.sum())
    conv_num = np.repeat(np.arange(scale.n_convs), lengths)
    offsets = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    turn_idx = (np.arange(n) - np.repeat(offsets, lengths)).astype(np.int32)

    # --- timestamps: per-conv cumulative deltas + pathologies ---
    deltas = rng.uniform(0.4, 1.6, n)
    gap_mask = (rng.random(n) < 4.0e-4) & (turn_idx > 0)
    deltas = np.where(gap_mask, deltas + rng.uniform(5.0, 60.0, n), deltas)
    cs = np.cumsum(deltas)
    base_cs = np.repeat(cs[offsets] - deltas[offsets], lengths)
    within = cs - base_cs
    conv_start = BASE_EPOCH + conv_num * 37.0
    ts_sec = conv_start + within

    clean_conv = rng.random(scale.n_convs) < 0.10
    row_clean = clean_conv[conv_num]
    bw_mask = (rng.random(n) < 0.10) & (~row_clean) & (turn_idx > 0)
    ts_sec = np.where(bw_mask, ts_sec - rng.uniform(0.5, 30.0, n), ts_sec)

    # --- roles / tools ---
    role = _ROLES[turn_idx % 4]
    alien_mask = rng.random(n) < 0.002
    role = np.where(alien_mask, "alien", role)
    is_tool = role == "tool"
    tool_pick = np.asarray(TOOLS)[(conv_num * 31 + turn_idx * 7) % len(TOOLS)]
    tool = np.where(is_tool, tool_pick, "")

    # --- tool-call payload fields ---
    args_bytes = (10 + (conv_num * 13 + turn_idx * 17) % 4991).astype(np.int64)
    latency_ms = (1 + (conv_num * 7 + turn_idx * 23) % 1999).astype(np.int64)
    r_tool = rng.random(n)
    sentinel_mask = is_tool & (r_tool < 0.003)
    negative_mask = is_tool & (r_tool >= 0.003) & (r_tool < 0.005)
    malformed_mask = is_tool & (r_tool >= 0.005) & (r_tool < 0.035)
    latency_ms = np.where(sentinel_mask, 32768, latency_ms)
    latency_ms = np.where(negative_mask, -5, latency_ms)

    # --- text assembly (vectorized pandas string ops) ---
    conv_id = pd.Series(conv_num).map(lambda c: f"conv-{c:06d}").to_numpy()
    filler = np.asarray(_FILLERS)[turn_idx % len(_FILLERS)]
    base_text = pd.Series(
        np.char.add(
            np.char.add("turn ", turn_idx.astype(str)),
            np.char.add(": ", filler),
        )
    )
    tool_text = (
        'calling <tool_call name="'
        + pd.Series(tool)
        + '" args_bytes='
        + pd.Series(args_bytes).astype(str)
        + " latency_ms="
        + pd.Series(latency_ms).astype(str)
        + "/> ok"
    )
    bad_tool_text = (
        'calling <tool_call name="' + pd.Series(tool) + '" args_bytes=?? latency_ms=/> ok'
    )
    text = base_text.where(~is_tool, tool_text).where(~malformed_mask, bad_tool_text)
    event_mask = (~is_tool) & (rng.random(n) < 0.05)
    event_tag = " [event:" + pd.Series(np.asarray(_EVENT_KINDS)[turn_idx % 4]) + "]"
    text = text.where(~event_mask, text + event_tag)

    df = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text.to_numpy(),
            "tool": tool,
            "ts": pd.to_datetime(ts_sec * 1e9).round("us"),
        }
    )

    # --- duplicate injection: stale earlier copies, keep-last must win ---
    dup_mask = rng.random(n) < 0.16
    dup2_mask = dup_mask & (rng.random(n) < 0.08)  # a few triple-dups
    order_final = np.stack([np.arange(n), np.full(n, 2)], axis=1)
    parts = [(df, order_final)]
    for mask, rank in ((dup_mask, 1), (dup2_mask, 0)):
        idx = np.flatnonzero(mask)
        stale = df.iloc[idx].copy()
        stale["text"] = "<<stale>> " + stale["text"]
        stale["ts"] = stale["ts"] - pd.Timedelta(milliseconds=50 * (2 - rank))
        parts.append((stale, np.stack([idx, np.full(len(idx), rank)], axis=1)))

    all_df = pd.concat([p[0] for p in parts], ignore_index=True)
    keys = np.concatenate([p[1] for p in parts])
    order = np.lexsort((keys[:, 1], keys[:, 0]))
    out = all_df.iloc[order].reset_index(drop=True)
    out["turn_idx"] = out["turn_idx"].astype(np.int32)
    return out


def write_transcripts(
    out_dir: str,
    scale_name: str = "sf-unit",
    seed: int = 42,
    rows_per_file: int = 2_000_000,
) -> str:
    """Write the raw table as lexically-ordered parquet files; returns dir.

    File-name order == ingest order, so Spark's ``_metadata.file_path`` +
    ``_metadata.row_index`` reconstruct the ingest ordinal exactly
    (SURVEY.md §7.4 risk 1: order-dependent keep-last dedup).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = generate_transcripts(scale_name, seed)
    # microsecond unit: Spark's parquet reader does not accept TIMESTAMP(NANOS)
    df["ts"] = df["ts"].astype("datetime64[us]")
    os.makedirs(out_dir, exist_ok=True)
    n_files = max(1, (len(df) + rows_per_file - 1) // rows_per_file)
    for i in range(n_files):
        chunk = df.iloc[i * rows_per_file : (i + 1) * rows_per_file]
        table = pa.Table.from_pandas(chunk, preserve_index=False)
        pq.write_table(table, os.path.join(out_dir, f"part-{i:05d}.parquet"))
    return out_dir
