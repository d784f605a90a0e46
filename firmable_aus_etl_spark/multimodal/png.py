"""Pure-stdlib PNG codec (zlib + filter reconstruction) — makes the
multimodal decode path REAL for PNG inputs (round-3 verdict item #4)
while JPEG/video stay behind DecodeUnavailable gates.

Scope: non-interlaced 8-bit images, color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline filters
(None/Sub/Up/Average/Paeth). That covers everything a compliant
encoder commonly emits for training-data corpora; exotic forms
(16-bit, Adam7 interlace, sub-byte depths) raise PngUnsupported so the
caller's codec gate stays honest about what actually decoded.

The encoder exists so tests can BUILD real PNGs (any filter type,
optional ancillary chunks) without codec libs: decode(encode(px)) is
the round-trip proof, and re-encoding identical pixels with different
tEXt metadata is the perceptual-dedup invariance fixture.

Reference semantics: PNG spec (RFC 2083) filter definitions; the
Paeth predictor is transcribed from the spec's pseudocode.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngUnsupported(ValueError):
    """Valid PNG, but outside the supported profile (16-bit, interlaced,
    sub-byte depth)."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode PNG bytes -> (width, height, channels, raw pixel bytes).

    Pixel bytes are row-major, ``channels`` interleaved samples per
    pixel (palette entries are expanded to RGB). Raises ValueError on
    malformed input, PngUnsupported outside the 8-bit/non-interlaced
    profile.
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = -1
    bit_depth = color_type = interlace = 0
    idat = bytearray()
    palette: bytes | None = None
    seen_iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = bytes(body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length  # length + type + body + crc
    if width < 0:
        raise ValueError("missing IHDR")
    if not seen_iend:
        raise ValueError("missing IEND")
    if bit_depth != 8:
        raise PngUnsupported(f"bit depth {bit_depth} (only 8 supported)")
    if interlace != 0:
        raise PngUnsupported("Adam7 interlace not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"bad color type {color_type}")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("decompressed size mismatch")
    out = bytearray(stride * height)
    prev_start = -1
    for y in range(height):
        base = y * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        o = y * stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            if prev_start >= 0:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_start + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                line[i] = (line[i] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                ul = out[prev_start + i - ch] if (prev_start >= 0 and i >= ch) else 0
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[o : o + stride] = line
        prev_start = o
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(out):
            rgb[3 * i : 3 * i + 3] = palette[3 * idx : 3 * idx + 3]
        return width, height, 3, bytes(rgb)
    return width, height, ch, bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    *,
    channels: int = 1,
    filter_type: int = 0,
    text_chunks: dict[str, str] | None = None,
) -> bytes:
    """Encode raw pixel bytes as a PNG (8-bit; channels 1=gray, 2=gray+
    alpha, 3=RGB, 4=RGBA). ``filter_type`` applies one filter to every
    scanline — exercising all five decode paths from tests is the
    point; a size-optimizing encoder would pick per-line. ``text_chunks``
    adds tEXt metadata (ancillary — changes bytes, not pixels: the
    perceptual-dedup invariance fixture)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    filtered = bytearray()
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        prev = pixels[(y - 1) * stride : y * stride] if y > 0 else bytes(stride)
        filtered.append(filter_type)
        for i in range(stride):
            x = row[i]
            left = row[i - channels] if i >= channels else 0
            up = prev[i]
            ul = prev[i - channels] if i >= channels else 0
            if filter_type == 0:
                filtered.append(x)
            elif filter_type == 1:
                filtered.append((x - left) & 0xFF)
            elif filter_type == 2:
                filtered.append((x - up) & 0xFF)
            elif filter_type == 3:
                filtered.append((x - (left + up) // 2) & 0xFF)
            elif filter_type == 4:
                filtered.append((x - _paeth(left, up, ul)) & 0xFF)
            else:
                raise ValueError(f"bad filter type {filter_type}")
    out = bytearray(_PNG_SIG)
    out += _chunk(
        b"IHDR", struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    )
    for key, val in (text_chunks or {}).items():
        out += _chunk(b"tEXt", key.encode("latin-1") + b"\x00" + val.encode("latin-1"))
    out += _chunk(b"IDAT", zlib.compress(bytes(filtered), 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def gray_from_pixels(pixels: bytes, channels: int) -> bytes:
    """Interleaved samples -> one grayscale byte per pixel (integer
    BT.601 luma for color; alpha ignored — dedup compares content, not
    transparency)."""
    if channels == 1:
        return pixels
    if channels == 2:
        return pixels[0::2]
    n = len(pixels) // channels
    out = bytearray(n)
    for i in range(n):
        base = i * channels
        r, g, b = pixels[base], pixels[base + 1], pixels[base + 2]
        out[i] = (r * 299 + g * 587 + b * 114) // 1000
    return bytes(out)


def ahash64(gray: bytes, width: int, height: int) -> int:
    """Average-hash over an 8x8 box-averaged downsample of a grayscale
    image: bit_i = block_i mean > global mean of block means. Returns a
    SIGNED 64-bit int (two's complement) to land in a Spark LongType.
    Images smaller than 8x8 sample with at-least-one-pixel blocks."""
    blocks = []
    for by in range(8):
        y0, y1 = by * height // 8, max((by + 1) * height // 8, by * height // 8 + 1)
        y1 = min(y1, height) if y1 > y0 else y0 + 1
        for bx in range(8):
            x0, x1 = bx * width // 8, max((bx + 1) * width // 8, bx * width // 8 + 1)
            x1 = min(x1, width) if x1 > x0 else x0 + 1
            acc = cnt = 0
            for y in range(y0, min(y1, height)):
                row = y * width
                for x in range(x0, min(x1, width)):
                    acc += gray[row + x]
                    cnt += 1
            blocks.append(acc / cnt if cnt else 0.0)
    mean = sum(blocks) / 64.0
    h = 0
    for i, v in enumerate(blocks):
        if v > mean:
            h |= 1 << i
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample (deterministic integer source mapping
    src = floor(dst * src_dim / dst_dim)) — the re-encode half of the
    real PNG resize path."""
    out = bytearray(out_w * out_h * channels)
    for oy in range(out_h):
        sy = oy * height // out_h
        for ox in range(out_w):
            sx = ox * width // out_w
            sbase = (sy * width + sx) * channels
            dbase = (oy * out_w + ox) * channels
            out[dbase : dbase + channels] = pixels[sbase : sbase + channels]
    return bytes(out)
