"""Multimodal column plumbing (BASELINE.json north-star component).

Images/audio/video are opaque ``binary`` columns plus typed metadata
structs. The Spark-side mechanics — schema, partition sizing, Arrow
batch shape, UDF signatures — are real and tested. Since round 4 the
codecs are REAL for the stdlib-decodable formats: PNG (png.py — zlib +
filter reconstruction), baseline JPEG (jpeg.py — Huffman + IDCT,
tables read from the stream), and GIF (gif.py — LZW, animation
composition) drive perceptual hashing / resize / feature extraction /
frame extraction on actual pixels, and RIFF/WAVE PCM (wav.py) drives
windowed RMS/ZCR/peak audio features on actual samples. Formats that
genuinely need external codec libraries (progressive/arithmetic JPEG,
webp, mp3/aac, real video containers) stay behind
``DecodeUnavailable`` gates or a clearly-marked deterministic fake.
"""

from firmable_aus_etl_spark.multimodal.ops import (
    MEDIA_SCHEMA,
    DecodeUnavailable,
    audio_features,
    audio_frame_windows,
    read_binary_dir,
    resize_images,
    with_media_metadata,
    decode_image_features,
    dedup_media_exact,
    dedup_media_perceptual,
    gif_frames,
    video_frames,
    perceptual_hash_images,
    frame_sample_plan,
)

__all__ = [
    "MEDIA_SCHEMA",
    "DecodeUnavailable",
    "audio_features",
    "audio_frame_windows",
    "read_binary_dir",
    "resize_images",
    "with_media_metadata",
    "decode_image_features",
    "dedup_media_exact",
    "dedup_media_perceptual",
    "gif_frames",
    "video_frames",
    "perceptual_hash_images",
    "frame_sample_plan",
]
