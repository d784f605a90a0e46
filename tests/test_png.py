"""Pure-stdlib PNG codec tests (no Spark): round-trip across all five
scanline filters, palette expansion, profile gates, aHash properties,
nearest-neighbor resize. Round-3 verdict item #4 — the multimodal
decode path must run on REAL pixels for PNG."""

from __future__ import annotations

import struct
import zlib

import pytest

from firmable_aus_etl_spark.multimodal import png as P


def gradient(w, h, channels=1):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            for c in range(channels):
                out.append((x * 7 + y * 13 + c * 31) % 256)
    return bytes(out)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_round_trip_all_filters_all_channels(filter_type, channels):
    w, h = 11, 7  # odd sizes catch stride bugs
    px = gradient(w, h, channels)
    data = P.encode_png(px, w, h, channels=channels, filter_type=filter_type)
    w2, h2, ch2, px2 = P.decode_png(data)
    assert (w2, h2, ch2) == (w, h, channels)
    assert px2 == px


def test_text_chunks_change_bytes_not_pixels():
    px = gradient(8, 8)
    a = P.encode_png(px, 8, 8)
    b = P.encode_png(px, 8, 8, text_chunks={"Author": "someone else"})
    assert a != b
    assert P.decode_png(a)[3] == P.decode_png(b)[3]


def test_different_filters_change_bytes_not_pixels():
    px = gradient(16, 16, 3)
    encs = [P.encode_png(px, 16, 16, channels=3, filter_type=f) for f in range(5)]
    assert len({e for e in encs}) == 5  # genuinely different byte streams
    for e in encs:
        assert P.decode_png(e)[3] == px


def test_multiple_idat_chunks():
    # spec allows IDAT to be split arbitrarily; rebuild one encode with
    # the compressed stream cut in two
    px = gradient(10, 10)
    data = P.encode_png(px, 10, 10)
    # locate the IDAT chunk
    pos, idat_body = 8, None
    parts = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        parts.append((ctype, body))
        pos += 12 + length
        if ctype == b"IEND":
            break
    out = bytearray(data[:8])
    for ctype, body in parts:
        if ctype == b"IDAT":
            mid = len(body) // 2
            out += P._chunk(b"IDAT", body[:mid])
            out += P._chunk(b"IDAT", body[mid:])
        else:
            out += P._chunk(ctype, body)
    assert P.decode_png(bytes(out))[3] == px


def test_palette_expansion():
    # hand-built 2x2 palette image: indices into a 3-color palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    scanlines = bytes([0, 0, 1, 0, 2, 1])  # filter0,idx0,idx1 / filter0,idx2,idx1
    data = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + P._chunk(b"PLTE", plte)
        + P._chunk(b"IDAT", zlib.compress(scanlines))
        + P._chunk(b"IEND", b"")
    )
    w, h, ch, px = P.decode_png(data)
    assert (w, h, ch) == (2, 2, 3)
    assert px == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 255, 0])


def test_profile_gates():
    px = gradient(4, 4)
    good = P.encode_png(px, 4, 4)
    with pytest.raises(ValueError):
        P.decode_png(b"notapng" + good)
    # 16-bit depth -> unsupported
    deep = bytearray(good)
    # IHDR body starts at offset 16; bit depth is byte 8 of the body
    deep[16 + 8] = 16
    with pytest.raises(P.PngUnsupported):
        P.decode_png(bytes(deep))
    # Adam7 interlace -> unsupported (interlace is byte 12 of IHDR body)
    inter = bytearray(good)
    inter[16 + 12] = 1
    with pytest.raises(P.PngUnsupported):
        P.decode_png(bytes(inter))
    # truncated stream (IEND and part of IDAT gone) -> malformed
    with pytest.raises(ValueError):
        P.decode_png(good[: len(good) - 20])


def test_gray_from_pixels():
    assert P.gray_from_pixels(bytes([10, 20, 30]), 1) == bytes([10, 20, 30])
    # gray+alpha keeps the gray sample
    assert P.gray_from_pixels(bytes([10, 255, 20, 0]), 2) == bytes([10, 20])
    # BT.601 integer luma
    assert P.gray_from_pixels(bytes([255, 0, 0]), 3) == bytes([(255 * 299) // 1000])
    assert P.gray_from_pixels(bytes([0, 0, 0, 255]), 4) == bytes([0])


def test_ahash_invariance_and_distinctness():
    g1 = gradient(32, 32)
    h1 = P.ahash64(g1, 32, 32)
    # resized version of the same image hashes identically under box
    # averaging of a smooth gradient at 2x scale
    g2 = P.resize_nearest(g1, 32, 32, 1, 64, 64)
    h2 = P.ahash64(g2, 64, 64)
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 2
    # visually distinct content: inverted gradient
    g3 = bytes(255 - b for b in g1)
    h3 = P.ahash64(g3, 32, 32)
    assert bin((h1 ^ h3) & ((1 << 64) - 1)).count("1") > 8


def test_ahash_tiny_images():
    # smaller than 8x8: every block still samples >= 1 pixel
    g = gradient(3, 2)
    h = P.ahash64(g, 3, 2)
    assert isinstance(h, int)
    assert -(1 << 63) <= h < 1 << 63


def test_resize_nearest_exact():
    # 2x2 checkerboard upscaled 2x: each pixel becomes a 2x2 block
    px = bytes([0, 255, 255, 0])
    up = P.resize_nearest(px, 2, 2, 1, 4, 4)
    assert up == bytes(
        [0, 0, 255, 255,
         0, 0, 255, 255,
         255, 255, 0, 0,
         255, 255, 0, 0]
    )
    # downscale back recovers the original
    assert P.resize_nearest(up, 4, 4, 1, 2, 2) == px
