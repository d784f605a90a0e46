"""Pure-stdlib baseline JPEG codec — the third real codec in the
multimodal family (png.py, wav.py): makes the image decode path REAL
for baseline (SOF0) AND progressive (SOF2) JFIF inputs — webp and
arithmetic-coded JPEG remain the honest image gates.

Decoder scope: baseline sequential DCT (SOF0/1) and progressive DCT
(SOF2 — spectral selection, successive approximation, EOB runs; round
5), 8-bit precision, 1 or 3 components, per-component sampling
factors 1 or 2 (covers 4:4:4, 4:2:2, 4:2:0), restart intervals
(DRI/RSTn), Huffman and quant tables READ FROM THE STREAM (so decode
correctness never depends on the encoder's table choice).
Arithmetic coding (SOF9+), hierarchical/lossless SOFs, 12-bit, and
>2 sampling factors raise JpegUnsupported.

Encoder scope: baseline 4:4:4 (or single-component grayscale) with the
Annex-K-style tables at a quality knob — enough to BUILD real JPEGs
for tests without codec libs. decode(encode(px)) is lossy by design;
tests bound the reconstruction error instead of expecting equality.

Numerics: float separable DCT-II/III over 8x8 blocks (exactness is
not required by the format — any conforming IDCT is approximate), all
quantization in integers, BT.601 color transform.
"""

from __future__ import annotations

import math
import struct


class JpegUnsupported(ValueError):
    """Valid JPEG, but outside the baseline-sequential profile."""


# ---------------------------------------------------------------- tables

def zigzag_order() -> list[int]:
    """The 64 zigzag positions generated algorithmically (diagonal walk,
    alternating direction) — no transcribed table to mistype."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()  # up-right: rows decreasing
        order.extend(i * 8 + j for i, j in diag)
    return order


_ZZ = zigzag_order()

# Annex K.1/K.2 base quantization tables (row-major)
_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 Huffman specs as (bits[1..16], values). The DECODER never
# uses these (tables come from DHT); a transcription slip here would
# only make the ENCODER emit a symbol outside its own table, which the
# round-trip tests would catch as a hard KeyError.
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _scaled_qt(base: list[int], quality: int) -> list[int]:
    """libjpeg-style quality scaling, clamped to [1, 255]."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (b * scale + 50) // 100)) for b in base]


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the JPEG canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[vi]] = (code, length)
            vi += 1
            code += 1
        code <<= 1
    return out


# ------------------------------------------------------------------ DCT

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _fdct8(block: list[float]) -> list[float]:
    out = [0.0] * 64
    tmp = [0.0] * 64
    for i in range(8):  # rows
        for u in range(8):
            s = sum(block[i * 8 + x] * _COS[u][x] for x in range(8))
            tmp[i * 8 + u] = s * _C[u] / 2
    for j in range(8):  # cols
        for u in range(8):
            s = sum(tmp[x * 8 + j] * _COS[u][x] for x in range(8))
            out[u * 8 + j] = s * _C[u] / 2
    return out


def _idct8(coef: list[float]) -> list[float]:
    tmp = [0.0] * 64
    out = [0.0] * 64
    for j in range(8):  # cols
        for x in range(8):
            s = sum(_C[u] * coef[u * 8 + j] * _COS[u][x] for u in range(8))
            tmp[x * 8 + j] = s / 2
    for i in range(8):  # rows
        for x in range(8):
            s = sum(_C[u] * tmp[i * 8 + u] * _COS[u][x] for u in range(8))
            out[i * 8 + x] = s / 2
    return out


# ------------------------------------------------------------- bit I/O

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                # marker inside the scan — signal to the caller by
                # rewinding; reads past this point are an error
                self.pos -= 1
                raise ValueError("marker reached")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_after_marker(self) -> int:
        """Byte-align and consume one RSTn marker; returns its index."""
        self.acc = 0
        self.nbits = 0
        if self.data[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        m = self.data[self.pos + 1]
        if not 0xD0 <= m <= 0xD7:
            raise ValueError(f"expected RSTn, got {m:02x}")
        self.pos += 2
        return m - 0xD0


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, coded magnitude bits)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ---------------------------------------------------------------- encode

def _forward_blocks(pixels, width, height, channels, quality):
    """Shared forward path (color transform -> 8x8 FDCT -> quantized
    zigzag blocks) for the baseline and progressive encoders: returns
    (qt, blocks, mcux, mcuy) with blocks[mcu][c] a 64-entry zigzag
    list; 4:4:4 sampling, MCUs row-major."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    qt = [_scaled_qt(_QT_LUMA, quality)]
    if channels == 3:
        qt.append(_scaled_qt(_QT_CHROMA, quality))
    planes: list[list[float]] = [[0.0] * (width * height) for _ in range(channels)]
    if channels == 1:
        for i, p in enumerate(pixels):
            planes[0][i] = float(p)
    else:
        for i in range(width * height):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            planes[0][i] = 0.299 * r + 0.587 * g + 0.114 * b
            planes[1][i] = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
            planes[2][i] = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    mcux, mcuy = (width + 7) // 8, (height + 7) // 8
    blocks = []
    for my in range(mcuy):
        for mx in range(mcux):
            per_c = []
            for c in range(channels):
                tq = 0 if c == 0 else 1
                plane = planes[c]
                block = [0.0] * 64
                for y in range(8):
                    sy = min(my * 8 + y, height - 1)
                    for x in range(8):
                        sx = min(mx * 8 + x, width - 1)
                        block[y * 8 + x] = plane[sy * width + sx] - 128.0
                coef = _fdct8(block)
                q = qt[tq]
                per_c.append(
                    [int(round(coef[_ZZ[k]] / q[_ZZ[k]])) for k in range(64)]
                )
            blocks.append(per_c)
    return qt, blocks, mcux, mcuy


def _jfif_headers(qt, channels, width, height, sof_marker):
    """SOI + APP0 + DQT + SOFn + DHT segments (shared)."""
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for ti, q in enumerate(qt):
        zz_q = bytes(q[_ZZ[k]] for k in range(64))
        out += b"\xff\xdb" + struct.pack(">HB", 67, ti) + zz_q
    ncomp = channels
    out += bytes([0xFF, sof_marker]) + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp
    )
    for c in range(ncomp):
        out += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    specs = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if channels == 3:
        specs += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, values) in specs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tc_th)
        out += bytes(bits) + bytes(values)
    return out


def encode_jpeg(
    pixels: bytes, width: int, height: int, *, channels: int = 1, quality: int = 90
) -> bytes:
    """Baseline JFIF encode of interleaved 8-bit pixels (1=gray, 3=RGB)
    at 4:4:4 sampling."""
    qt, blocks, mcux, mcuy = _forward_blocks(pixels, width, height, channels, quality)

    dc_tabs = [_canonical_codes(*_DC_LUMA)]
    ac_tabs = [_canonical_codes(*_AC_LUMA)]
    if channels == 3:
        dc_tabs.append(_canonical_codes(*_DC_CHROMA))
        ac_tabs.append(_canonical_codes(*_AC_CHROMA))

    bw = _BitWriter()
    pred = [0] * channels
    for per_c in blocks:
            for c in range(channels):
                tq = 0 if c == 0 else 1
                zz = per_c[c]
                # DC
                diff = zz[0] - pred[c]
                pred[c] = zz[0]
                size, mag = _magnitude(diff)
                code, ln = dc_tabs[tq][size]
                bw.write(code, ln)
                if size:
                    bw.write(mag, size)
                # AC with run-length + ZRL + EOB
                run = 0
                last_nz = 0
                for k in range(63, 0, -1):
                    if zz[k]:
                        last_nz = k
                        break
                for k in range(1, last_nz + 1):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_tabs[tq][0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    size, mag = _magnitude(zz[k])
                    code, ln = ac_tabs[tq][(run << 4) | size]
                    bw.write(code, ln)
                    bw.write(mag, size)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_tabs[tq][0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()

    out = _jfif_headers(qt, channels, width, height, 0xC0)
    ncomp = channels
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for c in range(ncomp):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += b"\x00\x3f\x00"
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode

class _HuffTable:
    """Canonical Huffman decoder: walk bits, match (code, length)."""

    def __init__(self, bits: list[int], values: list[int]) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        vi = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[vi]
                vi += 1
                code += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            v = self.lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code")


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode baseline JPEG -> (width, height, channels, pixel bytes)
    with channels 1 (gray) or 3 (RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qts: dict[int, list[int]] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    prog_state = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if frame is not None and frame.get("prog") and prog_state is not None:
                return _reconstruct_progressive(frame, qts, prog_state)
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            bpos = 0
            while bpos < len(body):
                pq_tq = body[bpos]
                if pq_tq >> 4 != 0:
                    raise JpegUnsupported("16-bit quant tables")
                zz_q = list(body[bpos + 1 : bpos + 65])
                if len(zz_q) != 64:
                    raise ValueError("truncated DQT")
                q = [0] * 64
                for k in range(64):
                    q[_ZZ[k]] = zz_q[k]
                qts[pq_tq & 0xF] = q
                bpos += 65
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                tc_th = body[bpos]
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                values = list(body[bpos + 17 : bpos + 17 + n])
                if len(bits) != 16 or len(values) != n:
                    raise ValueError("truncated DHT")
                table = _HuffTable(bits, values)
                if tc_th >> 4 == 0:
                    dc_tabs[tc_th & 0xF] = table
                else:
                    ac_tabs[tc_th & 0xF] = table
                bpos += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise JpegUnsupported(f"{precision}-bit precision")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:  # SOF2 progressive (round-5: real decode)
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise JpegUnsupported(f"{precision}-bit precision")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "prog": True}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegUnsupported(f"SOF{marker - 0xC0} (non-baseline)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                ci = next(
                    i for i, x in enumerate(frame["comps"]) if x["id"] == cs
                )
                scan.append((frame["comps"][ci], tdta >> 4, tdta & 0xF, ci))
            if frame.get("prog"):
                ss = body[1 + 2 * ns]
                se = body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                if prog_state is None:
                    prog_state = _init_prog_state(frame)
                pos = _decode_prog_scan(
                    data, pos + seglen, frame, scan, ss, se,
                    ahal >> 4, ahal & 0xF, dc_tabs, ac_tabs,
                    restart_interval, prog_state,
                )
                continue
            pos += seglen
            return _decode_scan(
                data, pos, frame,
                [(c, td, ta) for c, td, ta, _ci in scan],
                qts, dc_tabs, ac_tabs, restart_interval,
            )
        pos += seglen
    if frame is not None and frame.get("prog") and prog_state is not None:
        return _reconstruct_progressive(frame, qts, prog_state)
    raise ValueError("no scan found")


def _decode_scan(data, pos, frame, scan, qts, dc_tabs, ac_tabs, restart_interval):
    w, h = frame["w"], frame["h"]
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise JpegUnsupported("sampling factors > 2")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component plane buffers at component resolution
    planes = []
    for c in comps:
        cw = mcux * 8 * c["h"]
        ch = mcuy * 8 * c["v"]
        planes.append([0.0] * (cw * ch))

    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_after_marker()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, (comp, td, ta) in enumerate(scan):
                q = qts[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = [0] * 64
                        size = dc_tabs[td].decode(br)
                        diff = _extend(br.read_bits(size), size) if size else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = ac_tabs[ta].decode(br)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC index out of range")
                            s = rs & 0xF
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coef = [0.0] * 64
                        for k2 in range(64):
                            coef[_ZZ[k2]] = zz[k2] * q[_ZZ[k2]]
                        px = _idct8(coef)
                        cw = mcux * 8 * comp["h"]
                        ox = (mx * comp["h"] + bx) * 8
                        oy = (my * comp["v"] + by) * 8
                        plane = planes[ci]
                        for y in range(8):
                            row = (oy + y) * cw + ox
                            for x in range(8):
                                plane[row + x] = px[y * 8 + x] + 128.0
    return _assemble(w, h, comps, planes, mcux, hmax, vmax)


def _assemble(w, h, comps, planes, mcux, hmax, vmax):
    """Upsample component planes to full resolution + color transform
    — shared by the baseline and progressive reconstruction paths."""
    n = len(comps)
    out = bytearray(w * h * (3 if n == 3 else 1))
    if n == 1:
        cw = mcux * 8 * comps[0]["h"]
        p0 = planes[0]
        for y in range(h):
            for x in range(w):
                out[y * w + x] = _clamp8(p0[y * cw + x])
        return w, h, 1, bytes(out)
    if n != 3:
        raise JpegUnsupported(f"{n}-component scan")
    cws = [mcux * 8 * c["h"] for c in comps]
    for y in range(h):
        for x in range(w):
            vals = []
            for ci, c in enumerate(comps):
                sy = y * c["v"] // vmax
                sx = x * c["h"] // hmax
                vals.append(planes[ci][sy * cws[ci] + sx])
            Y, Cb, Cr = vals
            i = (y * w + x) * 3
            out[i] = _clamp8(Y + 1.402 * (Cr - 128.0))
            out[i + 1] = _clamp8(Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0))
            out[i + 2] = _clamp8(Y + 1.772 * (Cb - 128.0))
    return w, h, 3, bytes(out)


def _clamp8(v: float) -> int:
    iv = int(round(v))
    return 0 if iv < 0 else 255 if iv > 255 else iv


# ------------------------------------------------- progressive (SOF2)

def _init_prog_state(frame):
    """Coefficient accumulators for progressive decoding: one zigzag
    [0]*64 list per 8x8 block, per component, over the MCU-padded
    block grid; plus per-scan EOB-run carry."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise JpegUnsupported("sampling factors > 2")
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    coefs = [
        [[0] * 64 for _ in range(mcux * c["h"] * mcuy * c["v"])] for c in comps
    ]
    return {"coefs": coefs, "mcux": mcux, "mcuy": mcuy,
            "hmax": hmax, "vmax": vmax}


def _scan_end(data, pos):
    """First byte of the next non-RST marker at/after ``pos`` (skips
    entropy bytes, stuffed 0xFF00, and RSTn)."""
    p = pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return len(data)


def _decode_prog_scan(
    data, pos, frame, scan, ss, se, ah, al,
    dc_tabs, ac_tabs, restart_interval, st,
):
    """Decode one progressive scan into the coefficient accumulators.

    Spec structure (ITU T.81 §G.2, the same algorithm every libjpeg
    implements): DC scans (Ss=0) may be interleaved and carry either
    the first Al-shifted approximation (Ah=0) or one refinement bit
    per block; AC scans are single-component, cover the spectral band
    Ss..Se, and use EOB-run coding across blocks — first passes place
    Al-shifted coefficients, refinement passes emit one correction
    bit per already-nonzero coefficient and embed newly-nonzero +-1s.
    Returns the byte offset of the next marker."""
    coefs, mcux, mcuy = st["coefs"], st["mcux"], st["mcuy"]
    br = _BitReader(data, pos)
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    def refine_nonzero(zz, k):
        # one correction bit for a history-nonzero coefficient
        if br.read_bit():
            if zz[k] > 0 and not (zz[k] & p1):
                zz[k] += p1
            elif zz[k] < 0 and not (zz[k] & p1):
                zz[k] += m1
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        # DC scan: interleaved over MCUs when ns>1, else the single
        # component's own block raster
        pred = [0] * len(scan)
        mcu_count = 0
        if len(scan) > 1:
            units = [(my, mx) for my in range(mcuy) for mx in range(mcux)]
            for my, mx in units:
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    br.align_after_marker()
                    pred = [0] * len(scan)
                mcu_count += 1
                for si, (comp, td, _ta, ci) in enumerate(scan):
                    bw = mcux * comp["h"]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            zz = coefs[ci][
                                (my * comp["v"] + by) * bw + mx * comp["h"] + bx
                            ]
                            if ah == 0:
                                size = dc_tabs[td].decode(br)
                                diff = (
                                    _extend(br.read_bits(size), size) if size else 0
                                )
                                pred[si] += diff
                                zz[0] = pred[si] << al
                            else:
                                if br.read_bit():
                                    zz[0] |= p1
        else:
            comp, td, _ta, ci = scan[0]
            cw = (frame["w"] * comp["h"] + st["hmax"] - 1) // st["hmax"]
            ch = (frame["h"] * comp["v"] + st["vmax"] - 1) // st["vmax"]
            nbx, nby = (cw + 7) // 8, (ch + 7) // 8
            bw = mcux * comp["h"]
            for by in range(nby):
                for bx in range(nbx):
                    if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                        br.align_after_marker()
                        pred = [0]
                    mcu_count += 1
                    zz = coefs[ci][by * bw + bx]
                    if ah == 0:
                        size = dc_tabs[td].decode(br)
                        diff = _extend(br.read_bits(size), size) if size else 0
                        pred[0] += diff
                        zz[0] = pred[0] << al
                    else:
                        if br.read_bit():
                            zz[0] |= p1
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        comp, _td, ta, ci = scan[0]
        cw = (frame["w"] * comp["h"] + st["hmax"] - 1) // st["hmax"]
        ch = (frame["h"] * comp["v"] + st["vmax"] - 1) // st["vmax"]
        nbx, nby = (cw + 7) // 8, (ch + 7) // 8
        bw = mcux * comp["h"]
        mcu_count = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    br.align_after_marker()
                    eobrun = 0
                mcu_count += 1
                zz = coefs[ci][by * bw + bx]
                if ah == 0:  # first pass for this band
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = ac_tabs[ta].decode(br)
                        r, sz = rs >> 4, rs & 0xF
                        if sz == 0:
                            if r < 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.read_bits(r)
                                break
                            k += 16  # ZRL
                        else:
                            k += r
                            if k > se:
                                raise ValueError("AC index out of band")
                            zz[k] = _extend(br.read_bits(sz), sz) << al
                            k += 1
                else:  # refinement pass
                    if eobrun:
                        for k in range(ss, se + 1):
                            if zz[k]:
                                refine_nonzero(zz, k)
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = ac_tabs[ta].decode(br)
                        r, sz = rs >> 4, rs & 0xF
                        newval = 0
                        if sz == 0:
                            if r < 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.read_bits(r)
                                break
                            # ZRL: pass 16 zero-history coefficients
                        else:
                            if sz != 1:
                                raise ValueError("refine size must be 1")
                            newval = p1 if br.read_bit() else m1
                        while k <= se:
                            if zz[k]:
                                refine_nonzero(zz, k)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            zz[k] = newval
                        k += 1
                    else:
                        continue
                    # band ended via EOB: correct the rest of the block
                    for k2 in range(k, se + 1):
                        if zz[k2]:
                            refine_nonzero(zz, k2)
    return _scan_end(data, br.pos)


def _reconstruct_progressive(frame, qts, st):
    """Dequantize + IDCT the accumulated coefficient planes, then the
    shared upsample/color assembly."""
    comps = frame["comps"]
    coefs, mcux, mcuy = st["coefs"], st["mcux"], st["mcuy"]
    planes = []
    for ci, comp in enumerate(comps):
        q = qts[comp["tq"]]
        bw = mcux * comp["h"]
        bh = mcuy * comp["v"]
        cw = bw * 8
        plane = [0.0] * (cw * bh * 8)
        for bi, zz in enumerate(coefs[ci]):
            by, bx = divmod(bi, bw)
            coef = [0.0] * 64
            for k in range(64):
                coef[_ZZ[k]] = zz[k] * q[_ZZ[k]]
            px = _idct8(coef)
            ox, oy = bx * 8, by * 8
            for y in range(8):
                row = (oy + y) * cw + ox
                for x in range(8):
                    plane[row + x] = px[y * 8 + x] + 128.0
        planes.append(plane)
    return _assemble(
        frame["w"], frame["h"], comps, planes, mcux, st["hmax"], st["vmax"]
    )


def encode_jpeg_progressive(
    pixels: bytes, width: int, height: int, *, channels: int = 1,
    quality: int = 90, restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) JFIF encode at 4:4:4 — same forward path and
    quantized coefficients as encode_jpeg, entropy-coded as a 4-kind
    scan script that exercises every progressive decode path:

      1. DC, interleaved, successive approximation Al=1
      2. DC refinement (one bit per block)
      3. per component: AC band 1..63 first pass, Al=1
      4. per component: AC band 1..63 refinement, Al=0

    Point transforms per T.81: DC uses an arithmetic right shift; AC
    magnitudes shift toward zero with the sign reapplied. The AC
    passes code per-block EOBs (EOB-run length 1) — spec-valid and
    decodable by any reader; the decoder side additionally handles
    arbitrary EOB runs. A decode of this output is pixel-identical to
    decoding encode_jpeg of the same input (identical quantized
    coefficients; asserted in tests/test_jpeg.py).

    ``restart_interval`` > 0 emits DRI + RSTn markers in the DC scans
    (predictors reset per interval) and a DRI=0 segment before the AC
    scans — exercising the decoder's progressive restart path with a
    spec-legal stream."""
    qt, blocks, mcux, mcuy = _forward_blocks(pixels, width, height, channels, quality)

    dc_codes = [_canonical_codes(*_DC_LUMA)]
    ac_codes = [_canonical_codes(*_AC_LUMA)]
    if channels == 3:
        dc_codes.append(_canonical_codes(*_DC_CHROMA))
        ac_codes.append(_canonical_codes(*_AC_CHROMA))

    ncomp = channels
    out = _jfif_headers(qt, channels, width, height, 0xC2)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def sos_header(comp_ids, ss, se, ah, al):
        seg = bytearray(
            b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        )
        for c in comp_ids:
            seg += bytes([c + 1, (0x00 if c == 0 else 0x11)])
        seg += bytes([ss, se, (ah << 4) | al])
        return seg

    # --- scan 1: DC first pass (Al=1), interleaved
    bw = _BitWriter()
    pred = [0] * channels
    rst = 0
    for mi, per_c in enumerate(blocks):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.flush()
            bw.buf += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            pred = [0] * channels
        for c in range(channels):
            t = 0 if c == 0 else 1
            v = per_c[c][0] >> 1  # arithmetic shift (T.81 DC point transform)
            diff = v - pred[c]
            pred[c] = v
            size, mag = _magnitude(diff)
            code, ln = dc_codes[t][size]
            bw.write(code, ln)
            if size:
                bw.write(mag, size)
    bw.flush()
    out += sos_header(list(range(ncomp)), 0, 0, 0, 1) + bw.buf

    # --- scan 2: DC refinement (Ah=1, Al=0): bit 0 of each DC
    bw = _BitWriter()
    rst = 0
    for mi, per_c in enumerate(blocks):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.flush()
            bw.buf += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
        for c in range(channels):
            bw.write(per_c[c][0] & 1, 1)
    bw.flush()
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0) + bw.buf
    if restart_interval:
        # disable restarts for the (per-block-EOB) AC scans
        out += b"\xff\xdd" + struct.pack(">HH", 4, 0)

    # --- per component: AC first pass (Al=1) then refinement (Al=0)
    for c in range(ncomp):
        t = 0 if c == 0 else 1
        # first pass: code sign(v) * (|v| >> 1) like a baseline band
        bw = _BitWriter()
        for per_c in blocks:
            zz = per_c[c]
            run = 0
            vals = []
            for k in range(1, 64):
                av = abs(zz[k]) >> 1
                vals.append(av if zz[k] >= 0 else -av)
            last_nz = 0
            for k in range(63, 0, -1):
                if vals[k - 1]:
                    last_nz = k
                    break
            for k in range(1, last_nz + 1):
                v = vals[k - 1]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[t][0xF0]
                    bw.write(code, ln)
                    run -= 16
                size, mag = _magnitude(v)
                code, ln = ac_codes[t][(run << 4) | size]
                bw.write(code, ln)
                bw.write(mag, size)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[t][0x00]  # EOB (run of 1)
                bw.write(code, ln)
        bw.flush()
        out += sos_header([c], 1, 63, 0, 1) + bw.buf

        # refinement pass (Ah=1, Al=0) — T.81 G.1.2.3 emission order
        # (the jcphuff shape): ZRLs are emitted EAGERLY on reaching ANY
        # nonzero coefficient while the zero-history run exceeds 15 and
        # we are not yet past the last newly-nonzero position (later
        # runs fold into the EOB), so buffered correction bits always
        # belong to the span their symbol closes — the decoder consumes
        # them in walk order inside each span.
        bw = _BitWriter()
        for per_c in blocks:
            zz = per_c[c]
            eob_pos = 0
            for k in range(1, 64):
                if abs(zz[k]) == 1:
                    eob_pos = k
            run = 0
            corrections: list[int] = []
            for k in range(1, 64):
                av = abs(zz[k])
                if av == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob_pos:
                    code, ln = ac_codes[t][0xF0]
                    bw.write(code, ln)
                    run -= 16
                    for bit in corrections:
                        bw.write(bit, 1)
                    corrections = []
                if av > 1:  # history-nonzero: buffered correction bit
                    corrections.append(av & 1)
                    continue
                # newly nonzero (+-1 at this precision)
                code, ln = ac_codes[t][(run << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if zz[k] > 0 else 0, 1)
                for bit in corrections:
                    bw.write(bit, 1)
                corrections = []
                run = 0
            if run > 0 or corrections:
                code, ln = ac_codes[t][0x00]  # EOB closes the block
                bw.write(code, ln)
                for bit in corrections:
                    bw.write(bit, 1)
        bw.flush()
        out += sos_header([c], 1, 63, 1, 0) + bw.buf

    out += b"\xff\xd9"
    return bytes(out)
