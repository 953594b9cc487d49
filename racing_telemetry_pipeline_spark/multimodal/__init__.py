from .binary_ops import (
    attach_fake_payload,
    decode_image_batch,
    extract_payload_features,
    frame_sample_stub,
    resize_image_batch,
)

__all__ = [
    "attach_fake_payload",
    "decode_image_batch",
    "extract_payload_features",
    "frame_sample_stub",
    "resize_image_batch",
]
