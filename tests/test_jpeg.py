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
    i = bytes(good).find(b"\xff\xc0")
    # flip SOF0 to SOF9 (arithmetic coding) -> still unsupported
    arith = bytearray(good)
    arith[i + 1] = 0xC9
    with pytest.raises(J.JpegUnsupported):
        J.decode_jpeg(bytes(arith))
    # flip SOF0 to SOF2: progressive now DECODES for real, so a
    # baseline scan wearing a progressive frame header is ILL-FORMED
    # (its SOS says Ss=0, Se=63 — illegal for a progressive DC scan)
    prog = bytearray(good)
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError):
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


def test_progressive_jpeg_decodes_in_ops(spark):
    """Round 5: progressive JPEG is REAL — the Spark decode path hashes
    a progressive encode identically to the baseline encode of the
    same pixels (identical quantized coefficients)."""
    from firmable_aus_etl_spark.multimodal import perceptual_hash_images

    px = smooth(16, 16)
    df = spark.createDataFrame(
        [
            (1, J.encode_jpeg(px, 16, 16)),
            (2, J.encode_jpeg_progressive(px, 16, 16)),
        ],
        "media_id long, content binary",
    )
    hashes = {r.media_id: r.ahash for r in perceptual_hash_images(df).collect()}
    assert hashes[1] == hashes[2]


def test_progressive_roundtrip_equals_baseline():
    """decode(encode_progressive(px)) is PIXEL-IDENTICAL to
    decode(encode(px)): the scan script re-orders the same quantized
    coefficients, so reconstruction must agree bit for bit — gray and
    RGB, block-aligned and ragged sizes."""
    import random

    rng = random.Random(5)
    for w, h, ch in [(8, 8, 1), (16, 16, 3), (17, 13, 3), (24, 9, 1)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        base = J.decode_jpeg(J.encode_jpeg(px, w, h, channels=ch))
        prog = J.decode_jpeg(J.encode_jpeg_progressive(px, w, h, channels=ch))
        assert base == prog, (w, h, ch)


def test_progressive_decoder_handles_eob_runs():
    """The encoder emits per-block EOBs, but real progressive files
    use EOB RUNS spanning blocks — hand-craft a two-block stream whose
    AC scan is a single EOBRUN=2 symbol (custom Huffman table carrying
    the 0x10 EOBn symbol) and require it to decode like the DC-only
    image it is."""
    import struct as _st

    from firmable_aus_etl_spark.multimodal.jpeg import (
        _BitWriter,
        _canonical_codes,
        _jfif_headers,
        _scaled_qt,
        _DC_LUMA,
        _QT_LUMA,
        _ZZ,
    )

    w, h = 16, 8  # two 8x8 blocks, grayscale
    qt = [_scaled_qt(_QT_LUMA, 90)]
    out = bytearray(_jfif_headers(qt, 1, w, h, 0xC2))
    # custom AC table (id 1): symbols 0x00 (EOB1) and 0x10 (EOBRUN 2-3)
    bits = [0] * 16
    bits[0] = 2  # two 1-bit... not canonical-valid; use 2 codes at len 2
    bits = [0, 2] + [0] * 14
    values = [0x00, 0x10]
    out += b"\xff\xc4" + _st.pack(">HB", 19 + len(values), 0x11)
    out += bytes(bits) + bytes(values)
    ac = _canonical_codes(bits, values)
    dc = _canonical_codes(*_DC_LUMA)

    # scan 1: DC first pass (Al=0), two blocks with DC diffs +4, 0
    bw = _BitWriter()
    from firmable_aus_etl_spark.multimodal.jpeg import _magnitude

    for diff in (4, 0):
        size, mag = _magnitude(diff)
        code, ln = dc[size]
        bw.write(code, ln)
        if size:
            bw.write(mag, size)
    bw.flush()
    out += b"\xff\xda" + _st.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0x00])
    out += bw.buf
    # scan 2: AC band 1..63 first pass — ONE symbol: EOBRUN covering
    # both blocks (0x10 -> eobrun = (1<<1) + 0 extra bit... r=1 reads
    # 1 appended bit; bit=0 -> run of 2)
    bw = _BitWriter()
    code, ln = ac[0x10]
    bw.write(code, ln)
    bw.write(0, 1)  # eobrun = 2
    bw.flush()
    out += b"\xff\xda" + _st.pack(">HB", 8, 1) + bytes([1, 0x01, 1, 63, 0x00])
    out += bw.buf
    out += b"\xff\xd9"

    dw, dh, ch, px = J.decode_jpeg(bytes(out))
    assert (dw, dh, ch) == (w, h, 1)
    # block 1: flat DC 4*q0 -> level 128 + 4*q0/8; block 2: DC 4 again
    # (diff 0) -> both blocks flat and EQUAL
    q0 = qt[0][0]
    expect = max(0, min(255, round(128.0 + 4 * q0 / 8.0)))
    assert all(p == expect for p in px), (px[:8], expect)


def test_progressive_restart_markers_roundtrip():
    """Progressive DC scans with DRI/RSTn (predictor resets per
    interval, DRI=0 re-issued before the AC scans) — decode is still
    pixel-identical to the baseline path and the stream really
    carries restart markers."""
    import random

    rng = random.Random(77)
    for w, h, ch, ri in [(32, 16, 1, 2), (24, 24, 3, 1)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        base = J.decode_jpeg(J.encode_jpeg(px, w, h, channels=ch))
        data = J.encode_jpeg_progressive(
            px, w, h, channels=ch, restart_interval=ri
        )
        assert J.decode_jpeg(data) == base
        nrst = sum(
            1
            for i in range(len(data) - 1)
            if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
        )
        assert nrst > 0
