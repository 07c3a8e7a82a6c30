"""Multimodal (binary) column plumbing."""

from .columns import (  # noqa: F401
    MEDIA_SCHEMA,
    as_media,
    decode_image,
    extract_features,
    resize_images,
    sample_frames,
)
