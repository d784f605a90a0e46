"""Pure-stdlib GIF codec + real frame extraction: LZW round-trips,
animation composition (transparency, disposal, interlace), and
per-frame perceptual dedup through the distributed path."""

from __future__ import annotations

import random
import struct

import pytest

from firmable_aus_etl_spark.multimodal import gif as G
from firmable_aus_etl_spark.multimodal import png as P

PAL = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]


def frame(w, h, fn):
    return bytes(fn(x, y) for y in range(h) for x in range(w))


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_round_trip(mcs):
    rng = random.Random(7)
    maxv = (1 << mcs) - 1
    for n in (0, 1, 5, 257, 5000, 20000):  # 20000 forces dict reset at 8
        data = bytes(rng.randrange(maxv + 1) for _ in range(n))
        assert G.lzw_decode(mcs, G.lzw_encode(mcs, data)) == data, (mcs, n)


def test_gif_two_frame_round_trip():
    w, h = 10, 6
    f1 = frame(w, h, lambda x, y: (x + y) % 4)
    f2 = frame(w, h, lambda x, y: (x * y) % 4)
    data = G.encode_gif([f1, f2], w, h, PAL, delays_ms=[50, 120])
    W, H, frames = G.decode_gif(data)
    assert (W, H) == (w, h)
    assert [d for d, _ in frames] == [50, 120]
    assert frames[0][1] == b"".join(bytes(PAL[i]) for i in f1)
    assert frames[1][1] == b"".join(bytes(PAL[i]) for i in f2)


def test_gif_interlaced_image():
    """Hand-set the interlace flag: rows arrive in 8/8/4/2 pass order
    and must land back in display order."""
    w, h = 4, 8
    f = frame(w, h, lambda x, y: y % 4)
    data = bytearray(G.encode_gif([f], w, h, PAL))
    # image descriptor: 0x2C at the start of the frame section
    i = bytes(data).find(b"\x2c")
    il, it, iw, ih, iflags = struct.unpack("<HHHHB", data[i + 1 : i + 10])
    data[i + 9] = iflags | 0x40  # claim interlaced
    # re-order the index rows into pass order and re-compress
    order = []
    for start, step in G._INTERLACE_PASSES:
        order.extend(range(start, ih, step))
    rows = [f[y * w : (y + 1) * w] for y in order]
    mcs = data[i + 10]
    comp = G.lzw_encode(mcs, b"".join(rows))
    out = bytes(data[: i + 11])
    for k in range(0, len(comp), 255):
        chunk = comp[k : k + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    W, H, frames = G.decode_gif(out)
    assert frames[0][1] == b"".join(bytes(PAL[i2]) for i2 in f)


def test_gif_transparency_composes_over_previous():
    w, h = 4, 4
    base = frame(w, h, lambda x, y: 1)  # all red
    overlay = frame(w, h, lambda x, y: 2 if x == 0 else 0)  # col0 green, rest idx0
    data = bytearray(G.encode_gif([base, overlay], w, h, PAL))
    # mark index 0 transparent in the SECOND frame's GCE
    gces = []
    j = 0
    while True:
        j = bytes(data).find(b"\x21\xf9\x04", j)
        if j < 0:
            break
        gces.append(j)
        j += 1
    assert len(gces) == 2
    data[gces[1] + 3] |= 0x01  # transparency flag (index byte already 0)
    W, H, frames = G.decode_gif(bytes(data))
    out = frames[1][1]
    for y in range(h):
        for x in range(w):
            o = (y * w + x) * 3
            expect = PAL[2] if x == 0 else PAL[1]  # overlay green else base red
            assert out[o : o + 3] == bytes(expect), (x, y)


def test_gif_disposal_restore_previous():
    """Disposal 3: the middle frame's pixels must NOT persist into the
    canvas the next frame composes over."""
    w, h = 4, 4
    base = frame(w, h, lambda x, y: 1)              # all red
    overlay = frame(w, h, lambda x, y: 2)           # all green
    patch = frame(w, h, lambda x, y: 3 if x == 0 else 0)  # col0 blue
    data = bytearray(G.encode_gif([base, overlay, patch], w, h, PAL))
    gces = []
    j = 0
    while True:
        j = bytes(data).find(b"\x21\xf9\x04", j)
        if j < 0:
            break
        gces.append(j)
        j += 1
    data[gces[1] + 3] |= 0x0C  # overlay frame: disposal 3
    data[gces[2] + 3] |= 0x01  # patch frame: index 0 transparent
    W, H, frames = G.decode_gif(bytes(data))
    assert frames[1][1] == b"".join(bytes(PAL[i]) for i in overlay)
    out = frames[2][1]
    for y in range(h):
        for x in range(w):
            o = (y * w + x) * 3
            # col0 = patch blue; everything else = BASE red (the green
            # overlay was disposed back to the previous canvas)
            expect = PAL[3] if x == 0 else PAL[1]
            assert out[o : o + 3] == bytes(expect), (x, y)


def test_gif_profile_gates():
    with pytest.raises(ValueError):
        G.decode_gif(b"GIF90a" + bytes(20))


def test_gif_first_frame_is_the_image_still(spark):
    from firmable_aus_etl_spark.multimodal import perceptual_hash_images

    w, h = 16, 16
    ramp = frame(w, h, lambda x, y: min(3, (x + y) // 8))
    gif_data = G.encode_gif([ramp], w, h, PAL)
    rgb = b"".join(bytes(PAL[i]) for i in ramp)
    png_data = P.encode_png(rgb, w, h, channels=3)
    df = spark.createDataFrame(
        [(1, gif_data), (2, png_data)], "media_id long, content binary"
    )
    hashes = {r.media_id: r.ahash for r in perceptual_hash_images(df).collect()}
    assert hashes[1] == hashes[2]


def test_gif_frames_extraction_and_frame_dedup(spark):
    from firmable_aus_etl_spark.multimodal import dedup_media_perceptual
    from firmable_aus_etl_spark.multimodal.ops import gif_frames

    w, h = 16, 16
    a = frame(w, h, lambda x, y: min(3, x // 4))
    b = frame(w, h, lambda x, y: min(3, y // 4))
    # animation with a repeated frame: a, b, a
    data = G.encode_gif([a, b, a], w, h, PAL, delays_ms=[40, 40, 40])
    df = spark.createDataFrame([(7, data)], "media_id long, content binary")
    frames_df = gif_frames(df)
    rows = sorted(frames_df.collect(), key=lambda r: r.frame_idx)
    assert [r.ts_ms for r in rows] == [0, 40, 80]
    # frames are valid PNGs at the right size
    for r in rows:
        pw, ph, ch, _px = P.decode_png(bytes(r.content))
        assert (pw, ph, ch) == (w, h, 3)
    # per-frame perceptual dedup over the exploded frames finds the
    # repeat (frame 0 vs frame 2) and nothing else
    per_frame = frames_df.select(
        (frames_df.media_id * 1000 + frames_df.frame_idx).alias("media_id"),
        "content",
    )
    pairs = {(r.a_id, r.b_id) for r in dedup_media_perceptual(per_frame).collect()}
    assert pairs == {(7000, 7002)}


def test_gif_metadata_and_media_type(spark):
    from firmable_aus_etl_spark.multimodal import MEDIA_SCHEMA, with_media_metadata

    f = frame(12, 5, lambda x, y: 0)
    data = G.encode_gif([f], 12, 5, PAL)
    df = spark.createDataFrame(
        [(1, "a://x.gif", None, None, bytearray(data), None)], MEDIA_SCHEMA
    )
    out = with_media_metadata(df).collect()[0]
    assert out.mime == "image/gif" and out.media_type == "image"
    assert (out.meta.width, out.meta.height) == (12, 5)
