"""Multimodal training-data pipeline demo on REAL codecs (round 4):

    generate a small media corpus (PNGs via the stdlib encoder — with
    planted re-encoded duplicates and near-duplicates — plus WAV tones
    and a REAL baseline JPEG of the same pixels as one PNG) ->
    binaryFile ingest -> expression-level mime/dimension/duration
    sniffing -> exact binary dedup -> PERCEPTUAL image dedup on
    decoded pixels ACROSS FORMATS (aHash + pigeonhole hamming join
    pairs the JPEG with its PNG twin) -> 8x8 thumbnail resize
    (decode/resample/re-encode in the source format) ->
    grayscale-histogram image features -> windowed RMS/ZCR audio
    features.

Every heavy stage is the same Arrow-batched mapInPandas the 100 TB
path uses; only the fixture generation is driver-side.

    python examples/run_multimodal_pipeline.py [work_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from firmable_aus_etl_spark.multimodal import (
    audio_features,
    dedup_media_exact,
    dedup_media_perceptual,
    decode_image_features,
    gif_frames,
    video_frames,
    read_binary_dir,
    resize_images,
    with_media_metadata,
)
from firmable_aus_etl_spark.multimodal import avi as A
from firmable_aus_etl_spark.multimodal import gif as G
from firmable_aus_etl_spark.multimodal import jpeg as J
from firmable_aus_etl_spark.multimodal import png as P
from firmable_aus_etl_spark.multimodal import wav as W
from firmable_aus_etl_spark.session import get_session


def _gradient(w, h, *, invert=False, shift=0):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = (x * 7 + y * 13 + shift) % 256
            px.append(255 - v if invert else v)
    return bytes(px)


def build_fixture(d: str) -> None:
    os.makedirs(d, exist_ok=True)
    base = _gradient(32, 32)
    # original + exact byte copy + re-encode (different filter + tEXt
    # metadata: same pixels, different bytes) + visually distinct
    open(os.path.join(d, "img_a.png"), "wb").write(P.encode_png(base, 32, 32))
    open(os.path.join(d, "img_a_copy.png"), "wb").write(P.encode_png(base, 32, 32))
    open(os.path.join(d, "img_a_reenc.png"), "wb").write(
        P.encode_png(base, 32, 32, filter_type=4,
                     text_chunks={"Software": "another encoder"})
    )
    open(os.path.join(d, "img_b.png"), "wb").write(
        P.encode_png(_gradient(32, 32, invert=True), 32, 32)
    )
    tone = [int(12000 * math.sin(2 * math.pi * 330 * i / 16000)) for i in range(8000)]
    open(os.path.join(d, "tone.wav"), "wb").write(W.encode_wav(tone))
    open(os.path.join(d, "quiet.wav"), "wb").write(W.encode_wav([0] * 8000))
    # REAL baseline JPEG of a smooth ramp + its PNG twin: the
    # cross-format perceptual pair
    ramp = bytes(min(255, x * 4 + y * 3) for y in range(32) for x in range(32))
    open(os.path.join(d, "ramp.jpg"), "wb").write(
        J.encode_jpeg(ramp, 32, 32, quality=95)
    )
    open(os.path.join(d, "ramp.png"), "wb").write(P.encode_png(ramp, 32, 32))
    # animated GIF with a REPEATED frame (a, b, a) — the per-frame
    # dedup target
    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    fa = bytes(min(3, x // 8) for y in range(32) for x in range(32))
    fb = bytes(min(3, y // 8) for y in range(32) for x in range(32))
    open(os.path.join(d, "anim.gif"), "wb").write(
        G.encode_gif([fa, fb, fa], 32, 32, pal, delays_ms=[40, 40, 40])
    )
    # MJPEG-in-AVI with a repeated frame — TRUE video-container dedup
    # (frames are baseline JPEGs from the round-4 encoder; round-5
    # avi.py wraps/unwraps the RIFF container)
    rgb_a = b"".join(bytes(pal[i]) for i in fa)
    rgb_b = b"".join(bytes(pal[i]) for i in fb)
    ja = J.encode_jpeg(rgb_a, 32, 32, channels=3)
    jb = J.encode_jpeg(rgb_b, 32, 32, channels=3)
    open(os.path.join(d, "clip.avi"), "wb").write(
        A.encode_mjpeg_avi([ja, jb, ja], 32, 32, fps=25)
    )


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/multimodal_demo"
    media_dir = os.path.join(work, "media")
    build_fixture(media_dir)
    spark = get_session("multimodal-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    media = with_media_metadata(read_binary_dir(spark, media_dir))
    print("ingested:", media.count())
    media.select("uri", "mime", "meta.width", "meta.height",
                 "meta.duration_ms", "meta.sample_rate").show(truncate=False)

    # 1. exact binary dedup drops the byte-identical copy
    uniq = dedup_media_exact(media)
    print("after exact dedup:", uniq.count())

    # 2. perceptual dedup on DECODED pixels finds the PNG re-encode AND
    #    the cross-format JPEG/PNG pair
    images = uniq.filter(F.col("media_type") == "image")
    pairs = dedup_media_perceptual(images, max_hamming=3)
    print("perceptual near-dup pairs (hamming):")
    pairs.show()

    # 3. real resize: decode -> nearest resample -> PNG re-encode
    thumbs = resize_images(images, width=8, height=8)
    print("thumbnails:", [(r.media_id, len(r.content)) for r in thumbs.collect()])

    # 4. real image features: normalized grayscale histogram
    decode_image_features(images).select("media_id", "features").show(truncate=60)

    # 5. real frame extraction + per-frame dedup across BOTH
    #    video-shaped containers (animated GIF and MJPEG AVI): each
    #    clip's repeated frame (idx 0 vs 2) pairs up on decoded pixels,
    #    and the GIF's frames dedup against the AVI's (same palette art)
    anim = uniq.filter(F.col("mime").isin("image/gif", "video/avi"))
    frames = video_frames(anim)
    print("video frames:", frames.select("media_id", "frame_idx", "ts_ms").count())
    # media_id is an xxhash64 (full long range) — combine with the
    # frame index by hashing, not arithmetic (ANSI overflow)
    per_frame = frames.select(
        F.xxhash64("media_id", "frame_idx").alias("media_id"), "content"
    )
    print("repeated-frame pairs:")
    dedup_media_perceptual(per_frame).show()

    # 6. real audio features on the WAV clips
    audio = uniq.filter(F.col("mime") == "audio/wav")
    audio_features(audio, frame_samples=1600, hop_samples=1600).show()


if __name__ == "__main__":
    main()
