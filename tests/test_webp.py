"""VP8L (lossless WebP) codec tests — round-trips through this
package's own encoder, profile gates, Spark media-ops integration,
and (unique among the codecs here, because the container ships
libwebp.so.7) BIT-EXACT cross-validation against the reference
implementation in both directions: libwebp encodings must decode to
libwebp's own pixels, and this encoder's output must decode under
libwebp. That interop leg is what proves the generated 120-entry
distance map, the transform inverses, and the prefix-code reader
against ground truth rather than against themselves."""

from __future__ import annotations

import ctypes
import math
import random
import struct

import pytest

from firmable_aus_etl_spark.multimodal import webp as W


def _libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
        return lib
    except OSError:
        return None


_LIB = _libwebp()
needs_libwebp = pytest.mark.skipif(
    _LIB is None, reason="libwebp.so.7 not available for cross-validation"
)


def lib_encode(w: int, h: int, rgba: bytes) -> bytes:
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = _LIB.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    assert n > 0
    data = bytes(out[:n])
    _LIB.WebPFree(out)
    return data


def lib_decode(data: bytes) -> tuple[int, int, bytes]:
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p
    out = bytes(p[: w.value * h.value * 4])
    _LIB.WebPFree(p)
    return w.value, h.value, out


def as_rgba(channels: int, px: bytes, n: int) -> bytes:
    if channels == 4:
        return px
    if channels == 3:
        return b"".join(px[3 * i : 3 * i + 3] + b"\xff" for i in range(n))
    return b"".join(bytes((v, v, v, 255)) for v in px)


# ------------------------------------------------- own round-trips


@pytest.mark.parametrize(
    "w,h,channels", [(1, 1, 3), (4, 3, 4), (17, 9, 3), (31, 2, 1), (16, 16, 4)]
)
def test_roundtrip_random(w, h, channels):
    rng = random.Random(w * 1000 + h * 10 + channels)
    px = bytes(rng.randrange(256) for _ in range(w * h * channels))
    ww, hh, ch, out = W.decode_webp(W.encode_webp_lossless(w, h, channels, px))
    assert (ww, hh) == (w, h)
    assert as_rgba(ch, out, w * h) == as_rgba(channels, px, w * h)


def test_opaque_rgba_decodes_as_rgb():
    px = bytes(b for i in range(12) for b in (i, 2 * i, 3 * i, 255))
    w, h, ch, out = W.decode_webp(W.encode_webp_lossless(4, 3, 4, px))
    assert ch == 3
    assert out == b"".join(px[4 * i : 4 * i + 3] for i in range(12))


def test_gray_input_round_trips_as_rgb():
    px = bytes(range(48))
    w, h, ch, out = W.decode_webp(W.encode_webp_lossless(8, 6, 1, px))
    assert (w, h, ch) == (8, 6, 3)
    assert out == b"".join(bytes((v, v, v)) for v in px)


def test_constant_image_uses_simple_codes_and_stays_tiny():
    px = bytes([7, 99, 130]) * (64 * 64)
    data = W.encode_webp_lossless(64, 64, 3, px)
    # every channel is single-valued -> 0-bit codes; the whole 4096-px
    # image must fit in well under a KB
    assert len(data) < 256
    assert W.decode_webp(data)[3] == px


# ------------------------------------------------------ profile gates


def test_bad_riff_rejected():
    with pytest.raises(ValueError, match="bad RIFF"):
        W.decode_webp(b"RIFX" + b"\x00" * 20)


def test_lossy_vp8_gated():
    body = b"\x00" * 10
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    with pytest.raises(W.WebpUnsupported, match="lossy"):
        W.decode_webp(data)


def test_truncated_payload_raises_not_hangs():
    px = bytes(range(100)) * 3
    data = W.encode_webp_lossless(10, 10, 3, px)
    with pytest.raises(ValueError):
        W.decode_webp(data[:24])


def test_distance_map_has_120_unique_in_range_offsets():
    dm = W._plane_codes()
    assert len(dm) == len(set(dm)) == 120
    assert all(-7 <= x <= 8 and 0 <= y <= 7 for x, y in dm)
    assert all(y > 0 or x > 0 for x, y in dm)
    # spec's first eight entries, the close neighborhood
    assert dm[:8] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2)]


# --------------------------------------- libwebp cross-validation


def _photo(w: int, h: int, seed: int = 11) -> bytes:
    """Photo-like fixture: smooth correlated channels + noise texture —
    drives libwebp to subtract-green + predictor + cross-color
    transforms, a color cache, AND meta prefix codes in one stream."""
    rng = random.Random(seed)
    buf = bytearray()
    for y in range(h):
        for x in range(w):
            base = int(120 + 90 * math.sin(x / 37.0) * math.cos(y / 23.0))
            base += rng.randrange(-9, 10)
            buf += bytes(
                (
                    max(0, min(255, base + 30)),
                    max(0, min(255, base)),
                    max(0, min(255, base - 25 + (x % 5))),
                    255,
                )
            )
    return bytes(buf)


@needs_libwebp
@pytest.mark.parametrize(
    "name,w,h,maker",
    [
        # flat -> heavy short-distance LZ77 (exercises the generated
        # distance map head entries)
        ("flat", 64, 33, lambda rng: bytes([10, 200, 30, 255]) * (64 * 33)),
        # gradient -> predictor transform, many modes
        (
            "gradient",
            40,
            40,
            lambda rng: bytes(
                b
                for y in range(40)
                for x in range(40)
                for b in ((x * 6) % 256, (y * 6) % 256, (x * 3 + y * 3) % 256, 255)
            ),
        ),
        # <=4 colors -> color-indexing with 2-bit pixel bundling
        (
            "palette3",
            50,
            20,
            lambda rng: b"".join(
                [bytes((0, 0, 0, 255)), bytes((255, 0, 0, 255)), bytes((0, 255, 0, 255))][
                    rng.randrange(3)
                ]
                for _ in range(50 * 20)
            ),
        ),
        # 2 colors -> 1-bit bundling (8 indices per green byte)
        (
            "palette2",
            70,
            11,
            lambda rng: b"".join(
                [bytes((0, 0, 0, 255)), bytes((255, 255, 255, 255))][rng.randrange(2)]
                for _ in range(70 * 11)
            ),
        ),
        # tiled texture -> long LZ77 distances + color cache
        (
            "tiled",
            80,
            60,
            lambda rng: (
                lambda row: row * 60
            )((bytes(rng.randrange(256) for _ in range(8 * 4)) * 12)[: 80 * 4]),
        ),
        # 256-pixel noise -> 8-bit palette (no bundling), random indices
        (
            "noise",
            16,
            16,
            lambda rng: bytes(rng.randrange(256) for _ in range(16 * 16 * 4)),
        ),
        # varying alpha channel
        (
            "alpha",
            24,
            24,
            lambda rng: bytes(
                b
                for i in range(24 * 24)
                for b in (i % 256, (i * 7) % 256, (i * 13) % 256, (i * 3) % 256)
            ),
        ),
        # large opaque noise -> literal-heavy, all four prefix channels
        (
            "bignoise",
            64,
            64,
            lambda rng: b"".join(
                bytes(
                    (rng.randrange(256), rng.randrange(256), rng.randrange(256), 255)
                )
                for _ in range(64 * 64)
            ),
        ),
    ],
)
def test_decodes_libwebp_encodings_bit_exactly(name, w, h, maker):
    rgba = maker(random.Random(hash(name) & 0xFFFF))
    data = lib_encode(w, h, rgba)
    ref_w, ref_h, ref = lib_decode(data)  # libwebp's own pixels are the
    # oracle: in default (non-exact) mode the ENCODER may rewrite RGB
    # under alpha=0, so comparing against the input would test the
    # encoder's cleanup policy, not this decoder
    ww, hh, ch, out = W.decode_webp(data)
    assert (ww, hh) == (ref_w, ref_h) == (w, h)
    assert as_rgba(ch, out, w * h) == ref


@needs_libwebp
def test_decodes_transform_and_meta_prefix_stream():
    """The photo fixture empirically produces a stream with
    subtract-green + predictor + cross-color transforms, a color
    cache, and meta prefix codes (verified by parsing the header) —
    the maximal-feature decode path."""
    rgba = _photo(320, 120)
    data = lib_encode(320, 120, rgba)
    _, _, ref = lib_decode(data)
    ww, hh, ch, out = W.decode_webp(data)
    assert (ww, hh) == (320, 120)
    assert as_rgba(ch, out, ww * hh) == ref


@needs_libwebp
def test_libwebp_decodes_this_encoder():
    rng = random.Random(3)
    for w, h, channels in [(9, 7, 3), (16, 5, 4), (1, 13, 1)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * channels))
        ww, hh, ref = lib_decode(W.encode_webp_lossless(w, h, channels, px))
        assert (ww, hh) == (w, h)
        assert ref == as_rgba(channels, px, w * h)


# --------------------------------------------- Spark ops integration


def test_webp_decodes_in_media_ops(spark):
    from firmable_aus_etl_spark.multimodal import dedup_media_perceptual
    from firmable_aus_etl_spark.multimodal import png as P

    rng = random.Random(5)
    px = bytes(rng.randrange(256) for _ in range(32 * 32 * 3))
    as_webp = W.encode_webp_lossless(32, 32, 3, px)
    as_png = P.encode_png(px, 32, 32, channels=3)
    other = W.encode_webp_lossless(
        32, 32, 3, bytes(rng.randrange(256) for _ in range(32 * 32 * 3))
    )
    df = spark.createDataFrame(
        [(1, as_webp), (2, as_png), (3, other)], "media_id long, content binary"
    )
    pairs = {
        (r.a_id, r.b_id)
        for r in dedup_media_perceptual(df, max_hamming=0).collect()
    }
    # identical pixels across container formats -> perceptual dup;
    # the unrelated image must not pair with either
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)
