"""Multimodal binary-column plumbing: schema, Arrow batch shape, stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from racing_telemetry_pipeline_spark.multimodal import (
    attach_fake_payload,
    decode_image_batch,
    extract_payload_features,
    frame_sample_stub,
    resize_image_batch,
)


@pytest.fixture(scope="module")
def media_df(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return attach_fake_payload(docs)


def test_payload_schema_and_determinism(spark, media_df):
    row = media_df.select("doc_id", "payload", "media_type", "n_bytes").first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == 64  # 4x md5
    # deterministic across evaluations
    a = media_df.select("doc_id", F.crc32("payload").alias("c")).toPandas()
    b = media_df.select("doc_id", F.crc32("payload").alias("c")).toPandas()
    assert a.sort_values("doc_id").equals(b.sort_values("doc_id"))


def test_decode_batch(spark, media_df):
    feats = decode_image_batch(media_df).toPandas()
    assert len(feats) == media_df.count()
    assert feats["mean_luma"].between(0, 1).all()
    assert feats["is_decodable"].all()  # fake payloads are image/audio only


def test_jvm_byte_features(spark, media_df):
    f = extract_payload_features(media_df)
    pdf = f.toPandas()
    assert (pdf["n_bytes"] == 64).all()
    assert pdf["magic_hex"].str.len().eq(8).all()


def test_frame_sample_stub_raises_on_video(spark, media_df):
    # non-video rows pass through the plumbing
    ok = frame_sample_stub(media_df.filter(~F.col("media_type").startswith("video/")))
    assert ok.count() > 0
    # video rows hit the documented NotImplementedError
    video = media_df.withColumn("media_type", F.lit("video/mp4"))
    with pytest.raises(Exception, match="ffmpeg"):
        frame_sample_stub(video).count()


def test_resize_caps_longer_side_and_composes(spark, media_df):
    """Resize plumbing: longer side capped at max_side preserving aspect
    ratio, non-image rows untouched, schema preserved so the stage chains
    straight into decode_image_batch."""
    max_side = 20
    out = resize_image_batch(media_df, max_side=max_side)
    pdf = out.toPandas()
    src = media_df.select(
        "doc_id", "media_type", "width", "height", "n_bytes"
    ).toPandas().set_index("doc_id")
    assert len(pdf) == len(src)
    for _, r in pdf.iterrows():
        s = src.loc[r["doc_id"]]
        if r["media_type"].startswith("image/") and max(s["width"], s["height"]) > max_side:
            assert max(r["width"], r["height"]) == max_side
            # aspect ratio preserved up to integer rounding of each side
            scale = max_side / max(s["width"], s["height"])
            assert abs(r["width"] - s["width"] * scale) <= 0.5
            assert abs(r["height"] - s["height"] * scale) <= 0.5
            assert r["n_bytes"] == len(pdf[pdf.doc_id == r["doc_id"]].iloc[0]["payload"])
        else:
            assert (r["width"], r["height"]) == (s["width"], s["height"])
            assert r["n_bytes"] == s["n_bytes"]
    # schema-preserving: decode runs directly on the resized frame
    feats = decode_image_batch(out).toPandas()
    assert len(feats) == len(src)

    # injected kernel: proves the resize plumbing is kernel-agnostic
    def marker(payload, w, h, nw, nh):
        return b"\x01" * (nw * nh)

    marked = resize_image_batch(media_df, max_side=max_side, resizer=marker).toPandas()
    resized = marked[
        marked["media_type"].str.startswith("image/")
        & (
            src.loc[marked["doc_id"], ["width", "height"]].max(axis=1).values
            > max_side
        )
    ]
    assert (resized["n_bytes"] == resized["width"] * resized["height"]).all()


def test_decoder_dispatch_and_injection(spark, media_df):
    """The decode stage auto-selects its kernel (PIL where importable, the
    deterministic stub in this container) and accepts an injected kernel —
    proving the plumbing is decoder-agnostic."""
    from racing_telemetry_pipeline_spark.multimodal.binary_ops import (
        _decode_stub,
        _pick_decoder,
        _pil_available,
    )

    picked = _pick_decoder()
    if _pil_available():
        assert picked is not _decode_stub
    else:
        assert picked is _decode_stub

    def custom(payload, media_type):
        return {
            "mean_luma": float(len(payload)),
            "sharpness": 0.5,
            "is_decodable": media_type.startswith("image/"),
        }

    feats = decode_image_batch(media_df, decoder=custom).toPandas()
    assert (feats["mean_luma"] == feats["n_bytes"]).all()
    assert (feats["sharpness"] == 0.5).all()
