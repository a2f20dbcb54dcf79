"""Multimodal (image/audio/video) column support.

Opaque ``binary`` payloads + a typed metadata struct, processed with
Arrow-batched ``mapInPandas`` — the Spark-side plumbing (schema,
partitioning, batch shape) is real and tested; the codec layer is a
deterministic fake (``raw8``) because media libraries aren't available
in this environment (see multimodal/media.py docstring).
"""

from .media import (
    MEDIA_META_TYPE,
    attach_fake_media,
    decode_media,
    extract_media_features,
    resize_raw8,
    sample_frames,
)

__all__ = [
    "MEDIA_META_TYPE",
    "attach_fake_media",
    "decode_media",
    "extract_media_features",
    "resize_raw8",
    "sample_frames",
]
