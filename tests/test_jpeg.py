"""Pure-stdlib baseline JPEG codec tests (the third real codec, after
PNG and WAV): lossy round-trips with bounded error, profile gates,
cross-format perceptual-dedup agreement."""

from __future__ import annotations

import pytest

from firmable_aus_etl_spark.multimodal import jpeg as J
from firmable_aus_etl_spark.multimodal import png as P


def gradient(w, h, channels=1):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            for c in range(channels):
                out.append((x * 7 + y * 13 + c * 31) % 256)
    return bytes(out)


def smooth(w, h, channels=1):
    """Low-frequency image — JPEG's favorable case, tight error bound."""
    out = bytearray()
    for y in range(h):
        for x in range(w):
            for c in range(channels):
                out.append((x * 2 + y * 2 + c * 5) % 200)
    return bytes(out)


def test_zigzag_is_permutation_with_known_head():
    zz = J.zigzag_order()
    assert sorted(zz) == list(range(64))
    assert zz[:6] == [0, 1, 8, 16, 9, 2]
    assert zz[-4:] == [47, 55, 62, 63]


def test_flat_image_round_trips_exactly():
    flat = bytes([128]) * 64
    w, h, ch, out = J.decode_jpeg(J.encode_jpeg(flat, 8, 8, quality=90))
    assert (w, h, ch) == (8, 8, 1)
    assert out == flat


@pytest.mark.parametrize("channels", [1, 3])
def test_lossy_round_trip_bounded_error(channels):
    px = gradient(24, 16, channels)
    w, h, ch, out = J.decode_jpeg(
        J.encode_jpeg(px, 24, 16, channels=channels, quality=95)
    )
    assert (w, h, ch) == (24, 16, channels)
    mean = sum(abs(a - b) for a, b in zip(px, out)) / len(px)
    assert mean < 4.0, f"mean abs error {mean}"
    assert max(abs(a - b) for a, b in zip(px, out)) < 40


def test_non_multiple_of_8_dimensions():
    px = smooth(13, 11)
    w, h, ch, out = J.decode_jpeg(J.encode_jpeg(px, 13, 11, quality=95))
    assert (w, h, ch) == (13, 11, 1)
    mean = sum(abs(a - b) for a, b in zip(px, out)) / len(px)
    assert mean < 3.0


def test_quality_monotone_in_size_and_error():
    px = gradient(32, 32)
    lo = J.encode_jpeg(px, 32, 32, quality=30)
    hi = J.encode_jpeg(px, 32, 32, quality=95)
    assert len(lo) < len(hi)
    err = {}
    for name, data in (("lo", lo), ("hi", hi)):
        _, _, _, out = J.decode_jpeg(data)
        err[name] = sum(abs(a - b) for a, b in zip(px, out)) / len(px)
    assert err["hi"] < err["lo"]


def test_profile_gates():
    px = smooth(8, 8)
    good = bytearray(J.encode_jpeg(px, 8, 8))
    # flip SOF0 (0xC0) to SOF2 progressive -> unsupported
    i = bytes(good).find(b"\xff\xc0")
    prog = bytearray(good)
    prog[i + 1] = 0xC2
    with pytest.raises(J.JpegUnsupported):
        J.decode_jpeg(bytes(prog))
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x89PNGnota jpeg")
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(good)[: len(good) // 2])


def test_reencode_same_pixels_same_ahash():
    """JPEG's perceptual-dedup property: the SAME pixels re-encoded at
    different qualities hash within a small hamming distance, and a
    PNG of those pixels agrees too (cross-format near-dup). Monotonic
    non-wrapping gradient: block means are strictly ordered with real
    margins, so the +-1-pixel quantization error of a re-encode cannot
    flip threshold bits (the wrap-around fixture measured 4 flipped
    bits purely from boundary blocks sitting ON the mean)."""
    px = bytes(min(255, x * 4 + y * 3) for y in range(32) for x in range(32))
    hashes = []
    for data in (
        J.encode_jpeg(px, 32, 32, quality=95),
        J.encode_jpeg(px, 32, 32, quality=80),
        P.encode_png(px, 32, 32),
    ):
        if data[:2] == b"\xff\xd8":
            w, h, ch, out = J.decode_jpeg(data)
        else:
            w, h, ch, out = P.decode_png(data)
        hashes.append(P.ahash64(P.gray_from_pixels(out, ch), w, h))
    for a in hashes:
        for b in hashes:
            d = bin((a ^ b) & ((1 << 64) - 1)).count("1")
            assert d <= 3, f"re-encodes too far apart: hamming {d}"
    # visually distinct image stays far away
    inv = bytes(255 - b for b in px)
    _, _, _, out = J.decode_jpeg(J.encode_jpeg(inv, 32, 32, quality=95))
    hinv = P.ahash64(P.gray_from_pixels(out, 1), 32, 32)
    assert bin((hashes[0] ^ hinv) & ((1 << 64) - 1)).count("1") > 8


def test_cross_format_perceptual_dedup_spark(spark):
    from firmable_aus_etl_spark.multimodal import dedup_media_perceptual

    px = smooth(32, 32)
    rows = [
        (1, J.encode_jpeg(px, 32, 32, quality=95)),
        (2, P.encode_png(px, 32, 32)),
        (3, P.encode_png(bytes(255 - b for b in px), 32, 32)),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = {(r.a_id, r.b_id) for r in dedup_media_perceptual(df, max_hamming=3).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_resize_jpeg_real_path(spark):
    from firmable_aus_etl_spark.multimodal.ops import resize_images

    src = J.encode_jpeg(smooth(16, 16, 3), 16, 16, channels=3, quality=95)
    df = spark.createDataFrame([(1, src)], "media_id long, content binary")
    out = resize_images(df, width=8, height=8).collect()[0]
    # output is a decodable JPEG at the target size
    w, h, ch, _px = J.decode_jpeg(bytes(out.content))
    assert (w, h, ch) == (8, 8, 3)


def test_progressive_jpeg_gated_in_ops(spark):
    from firmable_aus_etl_spark.multimodal import perceptual_hash_images

    good = bytearray(J.encode_jpeg(smooth(8, 8), 8, 8))
    i = bytes(good).find(b"\xff\xc0")
    good[i + 1] = 0xC2  # progressive
    df = spark.createDataFrame(
        [(1, bytes(good))], "media_id long, content binary"
    )
    with pytest.raises(Exception) as ei:
        perceptual_hash_images(df).collect()
    assert "DecodeUnavailable" in str(ei.value) or "baseline" in str(ei.value)
