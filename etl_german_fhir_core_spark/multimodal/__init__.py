"""Multimodal column plumbing."""

from etl_german_fhir_core_spark.multimodal.binary import (
    attach_payload_meta,
    decode_image_stub,
    extract_features,
    frame_sample_plan,
    resize_images,
)

__all__ = [
    "attach_payload_meta",
    "decode_image_stub",
    "extract_features",
    "frame_sample_plan",
    "resize_images",
]
