"""Pure-stdlib WebP lossless (VP8L) codec — closes the round-7 codec
tail item: webp joins PNG/JPEG/GIF/WAV/AVI as a REAL decode path in
the multimodal pipeline (lossy VP8/VP8X-lossy stays behind the
DecodeUnavailable gate, documented honestly).

Decoder scope = the full VP8L spec ("WebP Lossless Bitstream
Specification", RFC-style doc shipped with libwebp):

- canonical prefix codes, both the simple (1-2 symbol) and the
  code-length-coded normal form, incl. the max_symbol early-out;
- meta prefix codes (entropy image) for spatially varying code groups;
- color cache (hash 0x1e35a7bd, 1..11 bits) interleaved with LZ77
  backward references and the 120-entry close-neighborhood distance
  map;
- all four transforms, applied in reverse stream order: predictor (14
  modes, flat-buffer top-right semantics at row ends exactly like
  libwebp), cross-color, subtract-green, color-indexing incl. sub-byte
  pixel bundling (1/2/4-bit palette indices packed into green).

The encoder exists so tests can BUILD real lossless webp files with no
codec libs: literal-only coding (no LZ77/transforms — valid per spec,
just bulkier), real per-channel Huffman codes in normal form, simple
codes where a channel is near-constant. decode(encode(px)) is the
round-trip proof; where libwebp.so is present (it is in this
container) the tests additionally cross-validate BOTH directions
against the reference implementation: my decoder must reproduce
libwebp's lossless encodings bit-exactly in pixels, and libwebp must
decode my encodings (tests/test_webp.py) — interop evidence the other
codecs in this package can't get because their reference libs are
absent here.

Reference parity: the reference repo treats media as opaque blobs
(SURVEY.md §2 multimodal is beyond-reference scope); this codec feeds
ops._decode_image the same way png.py/jpeg.py do.

The close-neighborhood distance map is GENERATED, not transcribed:
the spec's 120-entry table enumerates every offset (x, y) with
y in [0, 7], x in [-7, 8] above-or-left of the current pixel
(y > 0, or y == 0 and x > 0 — exactly 120 such offsets), ordered by
ascending x^2 + y^2 with ties broken by larger y first, then
non-negative x before negative. The libwebp cross-checks in
tests/test_webp.py exercise LZ77-heavy images precisely to prove this
generated table matches the reference table entry-for-entry.
"""

from __future__ import annotations

import heapq
import struct

_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class WebpUnsupported(ValueError):
    """Valid WebP container, but outside the lossless profile (lossy
    VP8, or a VP8X extended file with no VP8L payload)."""


# ---------------------------------------------------------------- bits


class _Bits:
    """LSB-first bit reader over bytes (VP8L convention: bit 0 of byte
    0 is the first bit of the stream)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        v = 0
        for i in range(n):
            v |= ((self.data[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def read1(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.buf)


# ------------------------------------------------------- prefix codes


class _PrefixCode:
    """Canonical prefix code (deflate-style assignment); decode walks
    MSB-first one stream bit at a time. A code with exactly one used
    symbol is degenerate per spec: it reads ZERO bits."""

    __slots__ = ("table", "single")

    def __init__(self, code_lengths: list[int]):
        used = [(l, s) for s, l in enumerate(code_lengths) if l > 0]
        if not used:
            raise ValueError("VP8L: prefix code with no symbols")
        if len(used) == 1:
            self.single = used[0][1]
            self.table = None
            return
        self.single = None
        # canonical assignment: shorter codes first, then symbol order
        counts: dict[int, int] = {}
        for l, _s in used:
            counts[l] = counts.get(l, 0) + 1
        max_len = max(counts)
        # Kraft check keeps malformed streams from looping forever
        kraft = sum(c << (max_len - l) for l, c in counts.items())
        if kraft > (1 << max_len):
            raise ValueError("VP8L: over-subscribed prefix code")
        next_code: dict[int, int] = {}
        code = 0
        for l in range(1, max_len + 1):
            code <<= 1
            next_code[l] = code
            code += counts.get(l, 0)
        table: dict[tuple[int, int], int] = {}
        for l, s in sorted(used):
            table[(l, next_code[l])] = s
            next_code[l] += 1
        self.table = table

    def decode(self, bits: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        table = self.table
        while True:
            code = (code << 1) | bits.read1()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("VP8L: invalid prefix code in stream")


def _read_prefix_code(bits: _Bits, alphabet_size: int) -> _PrefixCode:
    if bits.read1():  # simple code
        num_symbols = bits.read1() + 1
        first_8bit = bits.read1()
        sym0 = bits.read(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = bits.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise ValueError("VP8L: simple-code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            if sym0 >= alphabet_size:
                raise ValueError("VP8L: simple-code symbol out of range")
            lengths[sym0] = 1
        return _PrefixCode(lengths)
    # normal form: code lengths are themselves prefix-coded
    num_code_lengths = 4 + bits.read(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_ORDER[i]] = bits.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if bits.read1():  # max_symbol present
        length_nbits = 2 + 2 * bits.read(3)
        max_symbol = 2 + bits.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(bits)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            repeat = 3 + bits.read(2)
            for _ in range(repeat):
                if symbol < alphabet_size:
                    lengths[symbol] = prev_len
                    symbol += 1
        elif cl == 17:
            symbol += 3 + bits.read(3)
        else:  # 18
            symbol += 7 + bits.read(7) + 4  # 11..138
    return _PrefixCode(lengths)


# ------------------------------------------------ distance neighborhood


def _plane_codes() -> list[tuple[int, int]]:
    """The 120-entry close-neighborhood map for distance codes 1..120
    (see module docstring for the generation rule and its validation
    against libwebp)."""
    offs = [
        (x, y)
        for y in range(8)
        for x in range(-7, 9)
        if y > 0 or x > 0
    ]
    offs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
    return offs


_DIST_MAP = _plane_codes()


def _lz77_value(code: int, bits: _Bits) -> int:
    """Shared length/distance prefix decoding: codes 0..3 are the
    values 1..4; above that, (2 + (code&1)) << extra  + extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + bits.read(extra) + 1


# ------------------------------------------------------------ decoder


def _read_code_groups(
    bits: _Bits, xsize: int, ysize: int, cache_bits: int, is_argb: bool
) -> tuple[list[list[_PrefixCode]], list[int] | None, int]:
    """Read the (possibly meta-) prefix code groups for one image.
    Returns (groups, huffman_image or None, huffman_bits)."""
    huffman_image = None
    huffman_bits = 0
    num_groups = 1
    if is_argb and bits.read1():
        huffman_bits = 2 + bits.read(3)
        hx = _sub(xsize, huffman_bits)
        hy = _sub(ysize, huffman_bits)
        huffman_image = _decode_image(bits, hx, hy, is_argb=False)
        num_groups = 0
        for px in huffman_image:
            meta = ((px >> 16) & 0xFF) << 8 | ((px >> 8) & 0xFF)
            if meta >= num_groups:
                num_groups = meta + 1
        # normalize pixels to meta ids so the hot loop indexes directly
        huffman_image = [
            (((px >> 16) & 0xFF) << 8) | ((px >> 8) & 0xFF)
            for px in huffman_image
        ]
    cache_size = (1 << cache_bits) if cache_bits else 0
    sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    groups = []
    for _ in range(num_groups):
        groups.append([_read_prefix_code(bits, s) for s in sizes])
    return groups, huffman_image, huffman_bits


def _sub(size: int, bits_: int) -> int:
    return (size + (1 << bits_) - 1) >> bits_


def _decode_image(
    bits: _Bits, xsize: int, ysize: int, *, is_argb: bool
) -> list[int]:
    """Decode one entropy-coded image (spec: DecodeImageStream without
    the transform layer) into a flat list of ARGB uint32s."""
    cache_bits = 0
    if bits.read1():
        cache_bits = bits.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color cache bits")
    groups, huff_img, huff_bits = _read_code_groups(
        bits, xsize, ysize, cache_bits, is_argb
    )
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0
    n = xsize * ysize
    out = [0] * n
    pos = 0
    hx = _sub(xsize, huff_bits) if huff_img is not None else 0
    group = groups[0]
    g_code, r_code, b_code, a_code, d_code = group
    last_meta_key = -1
    while pos < n:
        if huff_img is not None:
            x = pos % xsize
            y = pos // xsize
            key = (y >> huff_bits) * hx + (x >> huff_bits)
            if key != last_meta_key:
                last_meta_key = key
                group = groups[huff_img[key]]
                g_code, r_code, b_code, a_code, d_code = group
        g = g_code.decode(bits)
        if g < 256:  # literal
            r = r_code.decode(bits)
            b = b_code.decode(bits)
            a = a_code.decode(bits)
            px = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> cache_shift] = px
        elif g < 280:  # LZ77 backward reference
            length = _lz77_value(g - 256, bits)
            dist_code = _lz77_value(d_code.decode(bits), bits)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: LZ77 reference out of bounds")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[
                        ((0x1E35A7BD * px) & 0xFFFFFFFF) >> cache_shift
                    ] = px
        else:  # color cache hit
            if cache is None:
                raise ValueError("VP8L: cache symbol with no cache")
            out[pos] = cache[g - 280]
            pos += 1
    return out


# ----------------------------------------------------------- transforms


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _chans(px: int) -> tuple[int, int, int, int]:
    return (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    la, lr, lg, lb = _chans(left)
    ta, tr_, tg, tb = _chans(top)
    if mode == 5:
        xa, xr, xg, xb = _chans(tr)
        return (
            (_avg2(_avg2(la, xa), ta) << 24)
            | (_avg2(_avg2(lr, xr), tr_) << 16)
            | (_avg2(_avg2(lg, xg), tg) << 8)
            | _avg2(_avg2(lb, xb), tb)
        )
    if mode == 6:
        xa, xr, xg, xb = _chans(tl)
        return (
            (_avg2(la, xa) << 24) | (_avg2(lr, xr) << 16)
            | (_avg2(lg, xg) << 8) | _avg2(lb, xb)
        )
    if mode == 7:
        return (
            (_avg2(la, ta) << 24) | (_avg2(lr, tr_) << 16)
            | (_avg2(lg, tg) << 8) | _avg2(lb, tb)
        )
    if mode == 8:
        xa, xr, xg, xb = _chans(tl)
        return (
            (_avg2(xa, ta) << 24) | (_avg2(xr, tr_) << 16)
            | (_avg2(xg, tg) << 8) | _avg2(xb, tb)
        )
    if mode == 9:
        xa, xr, xg, xb = _chans(tr)
        return (
            (_avg2(ta, xa) << 24) | (_avg2(tr_, xr) << 16)
            | (_avg2(tg, xg) << 8) | _avg2(tb, xb)
        )
    ca, cr, cg, cb = _chans(tl)
    if mode == 10:
        xa, xr, xg, xb = _chans(tr)
        return (
            (_avg2(_avg2(la, ca), _avg2(ta, xa)) << 24)
            | (_avg2(_avg2(lr, cr), _avg2(tr_, xr)) << 16)
            | (_avg2(_avg2(lg, cg), _avg2(tg, xg)) << 8)
            | _avg2(_avg2(lb, cb), _avg2(tb, xb))
        )
    if mode == 11:  # Select
        p_l = (
            abs(la + ta - ca - la) + abs(lr + tr_ - cr - lr)
            + abs(lg + tg - cg - lg) + abs(lb + tb - cb - lb)
        )
        p_t = (
            abs(la + ta - ca - ta) + abs(lr + tr_ - cr - tr_)
            + abs(lg + tg - cg - tg) + abs(lb + tb - cb - tb)
        )
        return left if p_l < p_t else top
    if mode == 12:  # ClampAddSubtractFull
        return (
            (_clamp(la + ta - ca) << 24) | (_clamp(lr + tr_ - cr) << 16)
            | (_clamp(lg + tg - cg) << 8) | _clamp(lb + tb - cb)
        )
    if mode == 13:  # ClampAddSubtractHalf (C truncating division)
        def half(avg: int, c: int) -> int:
            d = avg - c
            h = d // 2 if d >= 0 else -((-d) // 2)
            return _clamp(avg + h)

        return (
            (half(_avg2(la, ta), ca) << 24)
            | (half(_avg2(lr, tr_), cr) << 16)
            | (half(_avg2(lg, tg), cg) << 8)
            | half(_avg2(lb, tb), cb)
        )
    raise ValueError(f"VP8L: predictor mode {mode} out of range")


def _apply_predictor_inverse(
    px: list[int], w: int, h: int, modes: list[int], block_bits: int
) -> None:
    """Residuals -> pixels, in place. Per spec: (0,0) uses black, row 0
    uses L, column 0 uses T; top-right at the row end reads the flat
    buffer (== first pixel of the current row), matching libwebp."""
    mw = _sub(w, block_bits)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if y == 0:
                pred = 0xFF000000 if x == 0 else px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                mode = modes[(y >> block_bits) * mw + (x >> block_bits)]
                pred = _predict(
                    mode, px[i - 1], px[i - w], px[i - w - 1],
                    px[i - w + 1],
                )
            p = px[i]
            px[i] = (
                (((p >> 24) + (pred >> 24)) & 0xFF) << 24
                | ((((p >> 16) + (pred >> 16)) & 0xFF) << 16)
                | ((((p >> 8) + (pred >> 8)) & 0xFF) << 8)
                | ((p + pred) & 0xFF)
            )


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _apply_color_inverse(
    px: list[int], w: int, h: int, elems: list[int], block_bits: int
) -> None:
    mw = _sub(w, block_bits)
    for y in range(h):
        row = y * w
        for x in range(w):
            cte = elems[(y >> block_bits) * mw + (x >> block_bits)]
            g2r = _s8(cte & 0xFF)           # blue channel of the element
            g2b = _s8((cte >> 8) & 0xFF)    # green channel
            r2b = _s8((cte >> 16) & 0xFF)   # red channel
            p = px[row + x]
            g = _s8((p >> 8) & 0xFF)
            r = ((p >> 16) & 0xFF) + ((g2r * g) >> 5)
            r &= 0xFF
            b = (p & 0xFF) + ((g2b * g) >> 5) + ((r2b * _s8(r)) >> 5)
            px[row + x] = (p & 0xFF00FF00) | (r << 16) | (b & 0xFF)


def _apply_subtract_green_inverse(px: list[int]) -> None:
    for i, p in enumerate(px):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        px[i] = (p & 0xFF00FF00) | (r << 16) | b


def _apply_palette_inverse(
    px: list[int], w: int, h: int, palette: list[int], width_bits: int
) -> list[int]:
    size = len(palette)
    if width_bits == 0:
        return [
            palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < size else 0
            for p in px
        ]
    packed_w = _sub(w, width_bits)
    per = 1 << width_bits
    bpp = 8 >> width_bits
    mask = (1 << bpp) - 1
    out = [0] * (w * h)
    for y in range(h):
        prow = y * packed_w
        orow = y * w
        for xp in range(packed_w):
            g = (px[prow + xp] >> 8) & 0xFF
            base = xp << width_bits
            for k in range(per):
                x = base + k
                if x >= w:
                    break
                idx = (g >> (k * bpp)) & mask
                out[orow + x] = palette[idx] if idx < size else 0
    return out


def decode_vp8l(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a raw VP8L chunk payload -> (width, height, channels,
    pixel bytes): RGBA when any pixel is non-opaque, RGB otherwise."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    bits = _Bits(payload, pos=8)
    w = bits.read(14) + 1
    h = bits.read(14) + 1
    bits.read1()  # alpha hint (informational)
    if bits.read(3) != 0:
        raise WebpUnsupported("VP8L: version != 0")
    # transform layer (read order; applied in reverse)
    cur_w = w
    transforms: list[tuple] = []
    seen = set()
    while bits.read1():
        ttype = bits.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bb = 2 + bits.read(3)
            data = _decode_image(
                bits, _sub(cur_w, bb), _sub(h, bb), is_argb=False
            )
            modes = [(p >> 8) & 0xFF for p in data]
            transforms.append(("pred", bb, modes))
        elif ttype == 1:  # cross-color
            bb = 2 + bits.read(3)
            data = _decode_image(
                bits, _sub(cur_w, bb), _sub(h, bb), is_argb=False
            )
            transforms.append(("color", bb, data))
        elif ttype == 2:
            transforms.append(("subgreen",))
        else:  # color indexing
            size = bits.read(8) + 1
            raw = _decode_image(bits, size, 1, is_argb=False)
            palette = []
            prev = 0
            for p in raw:  # palette entries are component-wise deltas
                a = (((p >> 24) + (prev >> 24)) & 0xFF) << 24
                r = (((p >> 16) + (prev >> 16)) & 0xFF) << 16
                g = (((p >> 8) + (prev >> 8)) & 0xFF) << 8
                b = ((p + prev) & 0xFF)
                prev = a | r | g | b
                palette.append(prev)
            if size <= 2:
                wb = 3
            elif size <= 4:
                wb = 2
            elif size <= 16:
                wb = 1
            else:
                wb = 0
            transforms.append(("palette", wb, palette, cur_w))
            cur_w = _sub(cur_w, wb)
    px = _decode_image(bits, cur_w, h, is_argb=True)
    for t in reversed(transforms):
        if t[0] == "palette":
            _wb, pal, orig_w = t[1], t[2], t[3]
            px = _apply_palette_inverse(px, orig_w, h, pal, _wb)
            cur_w = orig_w
        elif t[0] == "subgreen":
            _apply_subtract_green_inverse(px)
        elif t[0] == "color":
            _apply_color_inverse(px, cur_w, h, t[2], t[1])
        else:
            _apply_predictor_inverse(px, cur_w, h, t[2], t[1])
    has_alpha = any((p >> 24) != 0xFF for p in px)
    if has_alpha:
        out = bytearray(w * h * 4)
        for i, p in enumerate(px):
            out[4 * i] = (p >> 16) & 0xFF
            out[4 * i + 1] = (p >> 8) & 0xFF
            out[4 * i + 2] = p & 0xFF
            out[4 * i + 3] = (p >> 24) & 0xFF
        return w, h, 4, bytes(out)
    out = bytearray(w * h * 3)
    for i, p in enumerate(px):
        out[3 * i] = (p >> 16) & 0xFF
        out[3 * i + 1] = (p >> 8) & 0xFF
        out[3 * i + 2] = p & 0xFF
    return w, h, 3, bytes(out)


def decode_webp(data: bytes) -> tuple[int, int, int, bytes]:
    """RIFF walk -> VP8L decode. Lossless files ('VP8L' chunk, directly
    or inside a VP8X extended container) decode for real; lossy 'VP8 '
    raises WebpUnsupported so the ops-layer gate stays honest."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP: bad RIFF header")
    pos = 12
    saw_lossy = False
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            saw_lossy = True
        pos += 8 + size + (size & 1)
    if saw_lossy:
        raise WebpUnsupported(
            "lossy VP8 webp requires codec libs absent from this package "
            "(only VP8L lossless decodes for real)"
        )
    raise WebpUnsupported("no VP8L chunk in WebP container")


# ------------------------------------------------------------ encoder


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Optimal prefix-code lengths (heapq Huffman); falls back to a
    fixed-length code if any optimal length exceeds the VP8L cap."""
    syms = [s for s, f in freqs.items() if f > 0]
    if len(syms) <= 1:
        return {s: 1 for s in syms}
    heap = [(freqs[s], (s,)) for s in syms]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    while len(heap) > 1:
        fa, ga = heapq.heappop(heap)
        fb, gb = heapq.heappop(heap)
        for s in ga + gb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, ga + gb))
    if max(depth.values()) > max_len:
        fixed = max(1, (len(syms) - 1).bit_length())
        return {s: fixed for s in syms}
    return depth


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    counts: dict[int, int] = {}
    for l in lengths.values():
        counts[l] = counts.get(l, 0) + 1
    code = 0
    next_code: dict[int, int] = {}
    for l in range(1, max(counts) + 1):
        code <<= 1
        next_code[l] = code
        code += counts.get(l, 0)
    out = {}
    for s in sorted(lengths, key=lambda s: (lengths[s], s)):
        out[s] = (next_code[lengths[s]], lengths[s])
        next_code[lengths[s]] += 1
    return out


def _write_code_msb_first(bw: _BitWriter, code: int, length: int) -> None:
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _write_prefix_code(
    bw: _BitWriter, lengths: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Emit one prefix code (simple form for <=2 symbols, else normal
    form with the lengths spelled out as code-length literals) and
    return symbol -> (code, nbits) for the payload writer."""
    syms = sorted(lengths)
    if len(syms) == 1 and syms[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if syms[0] < 2:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        return {syms[0]: (0, 0)}
    if len(syms) == 2 and syms[0] < 256 and syms[1] < 256:
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        if syms[0] < 2:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        bw.write(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    # normal form
    bw.write(0, 1)
    full = [lengths.get(s, 0) for s in range(alphabet_size)]
    cl_freq: dict[int, int] = {}
    for l in full:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    cl_lengths = _huffman_lengths(cl_freq, max_len=7)
    if len(cl_lengths) == 1:
        # single-symbol code-length code: the decoder's degenerate
        # prefix code reads ZERO bits per length, so the writer must
        # emit zero bits too (the 3-bit slot value below still marks
        # the symbol as present)
        cl_codes = {next(iter(cl_lengths)): (0, 0)}
    else:
        cl_codes = _canonical_codes(cl_lengths)
    bw.write(19 - 4, 4)  # num_code_lengths = 19 (covers every slot)
    for i in range(19):
        bw.write(cl_lengths.get(_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max_symbol shortcut: every length is spelled out
    for l in full:
        code, nbits = cl_codes[l]
        _write_code_msb_first(bw, code, nbits)
    return _canonical_codes({s: l for s, l in enumerate(full) if l})


def encode_webp_lossless(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """Build a real lossless WebP: literal-only VP8L (no transforms, no
    LZ77 — valid, just larger than libwebp would emit) with honest
    per-channel Huffman codes. Accepts 1 (gray), 3 (RGB), 4 (RGBA)
    channel pixel bytes, row-major."""
    if channels not in (1, 3, 4):
        raise ValueError("channels must be 1, 3, or 4")
    n = width * height
    if len(pixels) != n * channels:
        raise ValueError("pixel buffer does not match dimensions")
    if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
        raise ValueError("dimensions out of VP8L range")
    argb = []
    for i in range(n):
        if channels == 1:
            v = pixels[i]
            argb.append((0xFF, v, v, v))
        elif channels == 3:
            argb.append(
                (0xFF, pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2])
            )
        else:
            argb.append(
                (
                    pixels[4 * i + 3],
                    pixels[4 * i],
                    pixels[4 * i + 1],
                    pixels[4 * i + 2],
                )
            )
    has_alpha = any(a != 0xFF for a, _r, _g, _b in argb)
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    freqs: list[dict[int, int]] = [{}, {}, {}, {}]
    for a, r, g, b in argb:
        for fi, v in ((0, g), (1, r), (2, b), (3, a)):
            freqs[fi][v] = freqs[fi].get(v, 0) + 1
    tables = []
    for fi, alpha_size in ((0, 256 + 24), (1, 256), (2, 256), (3, 256)):
        lengths = _huffman_lengths(freqs[fi])
        tables.append(_write_prefix_code(bw, lengths, alpha_size))
    _write_prefix_code(bw, {0: 1}, 40)  # distance code: unused, 0-bit
    g_t, r_t, b_t, a_t = tables
    for a, r, g, b in argb:
        for tbl, v in ((g_t, g), (r_t, r), (b_t, b), (a_t, a)):
            code, nbits = tbl[v]
            if nbits:
                _write_code_msb_first(bw, code, nbits)
    payload = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
