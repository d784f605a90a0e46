"""Pure-stdlib GIF (87a/89a) codec — the fourth real codec in the
multimodal family and the one stdlib-feasible ANIMATION format: frame
sampling and per-frame perceptual work run on REAL decoded frames for
GIF inputs, which finally gives the video-shaped operators
(frame_sample_plan, dedup over frames) a fully real end-to-end path.

Decoder scope: GIF87a/89a, global/local color tables, interlaced
images, graphics-control extensions (frame delay + transparency), and
all four disposal methods — 0/1 draw over, 2 restore to background,
3 restore previous (one saved canvas, per spec). LZW code stream with
variable widths up to 12 bits, LSB-first, CLEAR/EOI handling.

Encoder scope: global-palette animations from palette-index frames
(real LZW compression with dictionary reset at 4096) — enough to
build multi-frame fixtures without codec libs.
"""

from __future__ import annotations

import struct


class GifUnsupported(ValueError):
    """Valid GIF, but outside the supported profile (reserved for
    future gates; all four disposal methods are now implemented)."""


# ----------------------------------------------------------------- LZW

def lzw_decode(min_code_size: int, data: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, next_code, width = reset()
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"bad LZW code {code}")
            out += entry
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return bytes(out)


def lzw_encode(min_code_size: int, data: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # widen ONE code later than the decoder's rule: the
            # decoder's first table add happens on its SECOND read, so
            # its add counter trails this one by exactly one — the
            # classic GIF-LZW off-by-one. Decoder: widen when its
            # next_code == 1<<width; encoder: when the just-assigned
            # code == 1<<width (i.e. next_code == (1<<width)+1).
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- decoding

_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def decode_gif(data: bytes) -> tuple[int, int, list[tuple[int, bytes]]]:
    """Decode GIF -> (width, height, frames) with frames =
    [(delay_ms, rgb_bytes)] composed onto the running canvas
    (disposal 0/1 draw-over, 2 restore-to-background, 3
    restore-previous)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    canvas = bytearray(w * h * 3)
    if gct:
        r, g, b = gct[3 * bg : 3 * bg + 3]
        for i in range(w * h):
            canvas[3 * i : 3 * i + 3] = bytes((r, g, b))
    frames: list[tuple[int, bytes]] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphics control
                size = data[pos]
                gflags, delay_cs, tidx = struct.unpack(
                    "<BHB", data[pos + 1 : pos + 5]
                )
                pos += 1 + size
                delay_ms = delay_cs * 10
                transparent = tidx if gflags & 0x01 else None
                disposal = (gflags >> 2) & 0x07
            # skip (remaining) data sub-blocks
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            il, it, iw, ih, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
            pos += 9
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = data[pos : pos + 3 * n]
                pos += 3 * n
            else:
                ct = gct
            if ct is None:
                raise ValueError("no color table for image")
            if disposal == 3:
                saved_canvas = bytes(canvas)  # restore-previous target
            mcs = data[pos]
            pos += 1
            chunks = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                chunks += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = lzw_decode(mcs, bytes(chunks))
            if len(idx) < iw * ih:
                raise ValueError("short frame data")
            # row order (interlace 4-pass or sequential)
            if iflags & 0x40:
                rows = []
                for start, step in _INTERLACE_PASSES:
                    rows.extend(range(start, ih, step))
            else:
                rows = list(range(ih))
            for src_y, dst_y in enumerate(rows):
                for x in range(iw):
                    ci = idx[src_y * iw + x]
                    if transparent is not None and ci == transparent:
                        continue
                    cy, cx = it + dst_y, il + x
                    if cy >= h or cx >= w:
                        continue
                    o = (cy * w + cx) * 3
                    canvas[o : o + 3] = ct[3 * ci : 3 * ci + 3]
            frames.append((delay_ms, bytes(canvas)))
            if disposal == 3:
                canvas = bytearray(saved_canvas)
            if disposal == 2 and gct is not None:
                r, g, b = gct[3 * bg : 3 * bg + 3]
                for dy in range(ih):
                    cy = it + dy
                    if cy >= h:
                        continue
                    for x in range(iw):
                        cx = il + x
                        if cx >= w:
                            continue
                        o = (cy * w + cx) * 3
                        canvas[o : o + 3] = bytes((r, g, b))
            delay_ms = 0
            transparent = None
            disposal = 0
        else:
            raise ValueError(f"unknown block 0x{block:02x}")
    if not frames:
        raise ValueError("no frames")
    return w, h, frames


# ------------------------------------------------------------- encoding

def encode_gif(
    frames: list[bytes],
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    *,
    delays_ms: list[int] | None = None,
) -> bytes:
    """Global-palette GIF89a from palette-index frames (one byte per
    pixel, all frames full-size). Palette is padded to a power of two
    (minimum 2 entries)."""
    if not frames:
        raise ValueError("need at least one frame")
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame size mismatch")
    bits = 1
    while (1 << bits) < len(palette):
        bits += 1
    bits = max(bits, 1)
    n = 1 << bits
    pal = list(palette) + [(0, 0, 0)] * (n - len(palette))
    delays = delays_ms or [100] * len(frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    for r, g, b in pal:
        out += bytes((r, g, b))
    mcs = max(bits, 2)  # LZW minimum code size must be >= 2
    for f, d in zip(frames, delays):
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, d // 10, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(mcs)
        comp = lzw_encode(mcs, f)
        for i in range(0, len(comp), 255):
            chunk = comp[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
