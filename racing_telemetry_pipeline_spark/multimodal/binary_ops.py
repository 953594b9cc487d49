"""Multimodal columns: opaque binary payloads + typed metadata.

Design for the 100 TB training-data case: image/audio/video live as
``binary`` columns (or object-store URIs) beside typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip per row.

The container ships no image/audio libraries, so the DECODE KERNEL is
stubbed (deterministic fake or NotImplementedError per the build contract)
— the Spark-side plumbing (schema, batch iterator shape, partitioning,
column pruning) is real and covered by tests/test_multimodal.py.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_SCHEMA_SUFFIX = (
    "payload binary, media_type string, width int, height int, n_bytes long"
)


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media payload derived from a text column.

    Stands in for the real binary ingestion path; payload bytes are
    md5(text) repeated, media metadata derived from the repo-wide signed
    64-bit hash (functions/hash64.py — the same value DuckDB computes,
    keeping the mm1 driver oracle in lockstep, see queries/multimodal_q.py).
    The hash is signed, so bucketing uses ``F.pmod``.
    """
    from ..functions.hash64 import hash64

    h = F.unhex(F.md5(F.col(text_col).cast("binary")))
    h64 = hash64(F.col(text_col))
    return (
        df.withColumn("payload", F.concat(h, h, h, h))
        .withColumn(
            "media_type",
            F.element_at(
                F.array(F.lit("image/png"), F.lit("image/jpeg"), F.lit("audio/wav")),
                (F.pmod(h64, F.lit(3)) + 1).cast("int"),
            ),
        )
        .withColumn("width", (F.pmod(h64, F.lit(64)) + 16).cast("int"))
        .withColumn("height", (F.pmod(h64, F.lit(48)) + 16).cast("int"))
        .withColumn("n_bytes", F.length("payload").cast("long"))
    )


def _decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decoder.

    A real deployment would dispatch to PIL/libvips/ffmpeg here; those
    libraries are not in this container, so the 'decoded' features are a
    stable function of the bytes (keeps tests deterministic end-to-end).
    """
    digest = hashlib.sha256(payload).digest()
    return {
        "mean_luma": digest[0] / 255.0,
        "sharpness": digest[1] / 255.0,
        "is_decodable": media_type.startswith(("image/", "audio/")),
    }


def _pil_available() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def _decode_pil(payload: bytes, media_type: str) -> dict:
    """Real image decode via PIL (only reachable where PIL is installed):
    mean luma over the grayscale plane, sharpness as the mean gradient
    magnitude. Undecodable bytes degrade to is_decodable=False rather than
    failing the task."""
    from io import BytesIO

    import numpy as np
    from PIL import Image

    if not media_type.startswith("image/"):
        return _decode_stub(payload, media_type)
    try:
        arr = (
            np.asarray(Image.open(BytesIO(payload)).convert("L"), dtype=np.float64)
            / 255.0
        )
        gy, gx = np.gradient(arr)
        return {
            "mean_luma": float(arr.mean()),
            "sharpness": float(np.hypot(gx, gy).mean()),
            "is_decodable": True,
        }
    except Exception:
        return {"mean_luma": float("nan"), "sharpness": float("nan"),
                "is_decodable": False}


def _pick_decoder():
    """Auto-upgrade: the deterministic stub in lib-less containers (this
    sandbox), the real PIL kernel wherever PIL is importable on the
    executors. The Spark-side plumbing is identical either way."""
    return _decode_pil if _pil_available() else _decode_stub


def decode_image_batch(df: DataFrame, decoder=None) -> DataFrame:
    """mapInPandas decode/feature-extract stage (Arrow batches of bytes).

    ``decoder(payload, media_type) -> dict`` defaults to ``_pick_decoder()``
    (PIL where available, the deterministic stub otherwise); tests inject a
    custom kernel to prove the dispatch plumbing without the library."""
    out_schema = (
        "doc_id long, media_type string, n_bytes long, "
        "mean_luma double, sharpness double, is_decodable boolean"
    )
    decode = decoder or _pick_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            fdf = pd.DataFrame(feats)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": pdf["n_bytes"].values,
                    "mean_luma": fdf["mean_luma"].values,
                    "sharpness": fdf["sharpness"].values,
                    "is_decodable": fdf["is_decodable"].values,
                }
            )

    return df.select(
        "doc_id", "payload", "media_type", "n_bytes"
    ).mapInPandas(run, schema=out_schema)


def extract_payload_features(df: DataFrame) -> DataFrame:
    """JVM-side byte features (no Python): sizes, prefixes, entropy proxy."""
    return df.select(
        "doc_id",
        "media_type",
        F.length("payload").alias("n_bytes"),
        F.hex(F.substring("payload", 1, 4)).alias("magic_hex"),
        F.crc32("payload").alias("payload_crc"),
    )


def _resize_stub(payload: bytes, width: int, height: int,
                 new_w: int, new_h: int) -> bytes:
    """Deterministic fake resize: scales the byte budget with the pixel
    ratio (truncate/repeat), so plumbing tests can assert size behavior
    without an image library."""
    if width <= 0 or height <= 0:
        return payload
    ratio = (new_w * new_h) / float(width * height)
    n = max(int(len(payload) * ratio), 1)
    reps = (n // max(len(payload), 1)) + 1
    return (payload * reps)[:n]


def _resize_pil(payload: bytes, width: int, height: int,
                new_w: int, new_h: int) -> bytes:
    """Real resize via PIL (only reachable where PIL is installed);
    undecodable bytes pass through unchanged rather than failing the
    task."""
    from io import BytesIO

    from PIL import Image

    try:
        img = Image.open(BytesIO(payload))
        out = BytesIO()
        img.resize((new_w, new_h)).save(out, format=img.format or "PNG")
        return out.getvalue()
    except Exception:
        return payload


def resize_image_batch(
    df: DataFrame, max_side: int = 32, resizer=None
) -> DataFrame:
    """mapInPandas resize stage: cap the longer image side at ``max_side``
    preserving aspect ratio; non-image rows pass through untouched.

    Schema-preserving (payload/media_type/width/height/n_bytes), so it
    composes ahead of ``decode_image_batch``. ``resizer(payload, w, h,
    new_w, new_h) -> bytes`` defaults to PIL where importable on the
    executors, the deterministic stub otherwise — same auto-upgrade
    dispatch as the decoder."""
    out_schema = f"doc_id long, {PAYLOAD_SCHEMA_SUFFIX}"
    kernel = resizer or (_resize_pil if _pil_available() else _resize_stub)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for p, m, w, h in zip(
                pdf["payload"], pdf["media_type"], pdf["width"], pdf["height"]
            ):
                longer = max(int(w), int(h))
                if not m.startswith("image/") or longer <= max_side:
                    payloads.append(p)
                    widths.append(int(w))
                    heights.append(int(h))
                    continue
                scale = max_side / float(longer)
                nw = max(int(round(w * scale)), 1)
                nh = max(int(round(h * scale)), 1)
                payloads.append(kernel(p, int(w), int(h), nw, nh))
                widths.append(nw)
                heights.append(nh)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": payloads,
                    "media_type": pdf["media_type"].values,
                    "width": widths,
                    "height": heights,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return df.select(
        "doc_id", "payload", "media_type", "width", "height"
    ).mapInPandas(run, schema=out_schema)


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub: real implementation needs ffmpeg.

    Raises NotImplementedError from the executor when actually invoked on
    video rows; the plan (schema, filter pushdown) is still constructible
    and testable for non-video data.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if (pdf["media_type"].str.startswith("video/")).any():
                raise NotImplementedError(
                    "video frame sampling requires ffmpeg (not in container)"
                )
            yield pdf[["doc_id", "media_type"]].assign(frame_no=0)

    return df.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema="doc_id long, media_type string, frame_no int"
    )
