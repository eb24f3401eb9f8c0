"""Multimodal column plumbing."""

from etl_german_fhir_core_spark.multimodal.binary import (
    BMP_MEDIA_TYPE,
    HAVE_PIL,
    PPM_MEDIA_TYPE,
    attach_payload_meta,
    decode_bmp,
    decode_image,
    decode_image_stub,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    extract_features,
    frame_sample_plan,
    resize_images,
)

__all__ = [
    "attach_payload_meta",
    "decode_bmp",
    "decode_image",
    "decode_image_stub",
    "decode_ppm",
    "encode_bmp",
    "encode_ppm",
    "extract_features",
    "frame_sample_plan",
    "resize_images",
    "BMP_MEDIA_TYPE",
    "HAVE_PIL",
    "PPM_MEDIA_TYPE",
]
