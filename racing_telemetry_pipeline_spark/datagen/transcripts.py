"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Produces the raw input table ``(conv_id, turn_idx, role, text, tool, ts)``
in an explicit *ingest order* (row position in the written files), with the
Barber-R1-profile pathologies injected at fixed seeded rates:

- ~16% duplicate ``(conv_id, turn_idx)`` rows whose earlier copies carry
  stale text — keep-LAST must win (reference dedup:
  /root/reference/src/ingestion/anomalies.py:39-95; observed dup rate
  /root/reference/data/processed/barber_r1/ingestion_stats.json:6-7).
- backwards timestamps on ~10% of turns in ~90% of conversations
  (reference: 1.05M backwards ts on 18/20 cars,
  DATA_QUALITY_REPORT_BARBER_R1.md:86-113); ~10% of conversations clean.
- sparse time gaps > 2 s (reference: 71 gaps, ingestion_stats.json:30).
- sentinel latency_ms=32768 (reference lap sentinel:
  src/transform/lap_repair.py:15), malformed tool-call markup (~3% of tool
  turns), negative latencies, unknown roles.
- 1-3 "hot" conversations each holding ~5% of all turns (skew testing).

All numeric work is numpy; string assembly uses pyarrow compute kernels
(binary_join_element_wise / if_else), which generate ~40M rows/min —
pandas object-string concatenation was 10x slower.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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

BASE_EPOCH = 1735689600  # 2025-01-01 00:00:00 UTC, seconds


def _conv_lengths(scale: Scale, rng: np.random.Generator) -> np.ndarray:
    base = 5 + rng.geometric(1.0 / max(scale.mean_turns - 5, 1), scale.n_convs)
    base = np.minimum(base, scale.mean_turns * 8)
    total = int(base.sum())
    hot_len = max(int(0.05 * total), base.max() + 1)
    base[: scale.n_hot] = hot_len
    return base.astype(np.int64)


_LS = pa.large_string()


def _join(*parts) -> pa.Array:
    """Element-wise concat; the last positional arg of the arrow kernel is
    the separator. Every input (arrays AND literals) is coerced to
    large_string so the output offsets are 64-bit — at the wide-pair scale
    (~58M rows) the assembled text column exceeds the 2 GB limit of 32-bit
    string offsets INSIDE these kernels (round-4: 'offset overflow while
    concatenating arrays'), not just at the final concat the schema cast
    below used to cover."""
    conv = [pa.scalar(p, _LS) if isinstance(p, str) else p for p in parts]
    return pc.binary_join_element_wise(*conv, pa.scalar("", _LS))


def generate_transcripts(scale_name: str = "sf-unit", seed: int = 42) -> pa.Table:
    """Return the raw transcript table as a pyarrow Table in ingest order."""
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
    ts_us = np.round(ts_sec * 1e6).astype(np.int64)

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

    # --- text assembly (arrow kernels, no per-row Python) ---
    turn_s = pc.cast(pa.array(turn_idx), _LS)
    filler = pc.cast(pa.array(np.asarray(_FILLERS)[turn_idx % len(_FILLERS)]), _LS)
    base_text = _join("turn ", turn_s, ": ", filler)
    tool_pa = pc.cast(pa.array(tool), _LS)
    tool_text = _join(
        'calling <tool_call name="', tool_pa,
        '" args_bytes=', pc.cast(pa.array(args_bytes), _LS),
        " latency_ms=", pc.cast(pa.array(latency_ms), _LS),
        "/> ok",
    )
    bad_tool_text = _join(
        'calling <tool_call name="', tool_pa, '" args_bytes=?? latency_ms=/> ok'
    )
    text = pc.if_else(pa.array(is_tool), tool_text, base_text)
    text = pc.if_else(pa.array(malformed_mask), bad_tool_text, text)
    event_mask = (~is_tool) & (rng.random(n) < 0.05)
    event_tag = _join(
        " [event:", pc.cast(pa.array(np.asarray(_EVENT_KINDS)[turn_idx % 4]), _LS), "]"
    )
    text = pc.if_else(pa.array(event_mask), _join(text, event_tag), text)

    table = pa.table(
        {
            "conv_id": _join("conv-", pc.utf8_lpad(
                pc.cast(pa.array(conv_num), _LS), 6, "0")),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role),
            "text": text,
            "tool": tool_pa,
            "ts": pa.array(ts_us, pa.timestamp("us")),
        }
    )

    # --- duplicate injection: stale earlier copies, keep-last must win ---
    dup_mask = rng.random(n) < 0.16
    dup2_mask = dup_mask & (rng.random(n) < 0.08)  # a few triple-dups
    parts = [table]
    keys = [np.stack([np.arange(n), np.full(n, 2)], axis=1)]
    for mask, rank in ((dup_mask, 1), (dup2_mask, 0)):
        idx = np.flatnonzero(mask)
        stale = table.take(idx)
        stale = stale.set_column(
            stale.schema.get_field_index("text"),
            "text",
            _join("<<stale>> ", stale["text"].combine_chunks()),
        )
        stale = stale.set_column(
            stale.schema.get_field_index("ts"),
            "ts",
            pa.array(
                ts_us[idx] - 50_000 * (2 - rank), pa.timestamp("us")
            ),
        )
        parts.append(stale)
        keys.append(np.stack([idx, np.full(len(idx), rank)], axis=1))

    all_tbl = pa.concat_tables(parts)
    # 64-bit string offsets: at sf-scaling+ the ingest-order take would
    # otherwise overflow 32-bit offsets concatenating >2 GB of text into
    # one chunk (parquet writes the same BYTE_ARRAY type either way)
    big = pa.schema(
        [
            pa.field(f.name, pa.large_string())
            if pa.types.is_string(f.type)
            else f
            for f in all_tbl.schema
        ]
    )
    all_tbl = all_tbl.cast(big)
    k = np.concatenate(keys)
    order = np.lexsort((k[:, 1], k[:, 0]))
    return all_tbl.take(order)


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
    import pyarrow.parquet as pq

    table = generate_transcripts(scale_name, seed)
    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    n_files = max(1, (n + rows_per_file - 1) // rows_per_file)
    for i in range(n_files):
        chunk = table.slice(i * rows_per_file, rows_per_file)
        pq.write_table(chunk, os.path.join(out_dir, f"part-{i:05d}.parquet"))
    return out_dir
