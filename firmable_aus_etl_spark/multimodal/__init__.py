"""Multimodal column plumbing (BASELINE.json north-star component).

Images/audio/video are opaque ``binary`` columns plus typed metadata
structs. The Spark-side mechanics — schema, partition sizing, Arrow
batch shape, UDF signatures — are real and tested; the actual codec
work is stubbed (image/audio libraries are not in this container)
behind ``DecodeUnavailable`` or a deterministic fake, clearly marked.
"""

from firmable_aus_etl_spark.multimodal.ops import (
    MEDIA_SCHEMA,
    DecodeUnavailable,
    read_binary_dir,
    with_media_metadata,
    decode_image_features,
    dedup_media_exact,
    dedup_media_perceptual,
    perceptual_hash_images,
    frame_sample_plan,
)

__all__ = [
    "MEDIA_SCHEMA",
    "DecodeUnavailable",
    "read_binary_dir",
    "with_media_metadata",
    "decode_image_features",
    "dedup_media_exact",
    "dedup_media_perceptual",
    "perceptual_hash_images",
    "frame_sample_plan",
]
