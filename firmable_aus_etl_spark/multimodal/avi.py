"""Minimal MJPEG-in-AVI container codec — pure stdlib (struct only).

AVI is a RIFF container (the same chunk grammar as WAV, one level
deeper): `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf ...))
LIST('movi' 00dc...) [idx1])`. An MJPEG video stream stores each frame
as an independent baseline-JPEG blob in a `00dc` chunk, so the
existing stdlib JPEG decoder (multimodal/jpeg.py) does all the pixel
work — this module only walks/builds the container. That makes true
VIDEO frame extraction real in this engine for the one mainstream
container whose frames need no inter-frame codec state.

The reference repo has no media code at all; this belongs to the
beyond-reference LLM-pipeline surface (multimodal dedup on video).

Scope: fccHandler/biCompression `MJPG` (or `dmb1`, the Matrox/OpenDML
alias) with `00dc`/`00db` frame chunks. Anything else (DIB/raw,
cinepak, h264 in AVI, OpenDML `indx` super-indexes) raises
AviUnsupported, which callers surface as DecodeUnavailable — the same
honest gate as the other codecs.
"""

from __future__ import annotations

import struct

MJPEG_FOURCCS = {b"MJPG", b"mjpg", b"dmb1", b"MJPA"}


class AviUnsupported(ValueError):
    """AVI feature outside the MJPEG-baseline scope of this codec."""


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def encode_mjpeg_avi(
    jpeg_frames: list[bytes], width: int, height: int, *, fps: int = 10
) -> bytes:
    """Build a spec-shaped single-stream MJPEG AVI from baseline-JPEG
    frame blobs (e.g. jpeg.encode_jpeg output), with idx1 index."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")
    for f in jpeg_frames:
        if not f.startswith(b"\xff\xd8"):
            raise ValueError("frames must be JPEG (SOI missing)")
    usec_per_frame = 1_000_000 // fps
    n = len(jpeg_frames)
    max_bytes = max(len(f) for f in jpeg_frames)

    avih = struct.pack(
        "<14I",
        usec_per_frame, max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, n, max_bytes, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<I2i2H6I", 40, width, height, 1, 24, 0x47504A4D,  # 'MJPG' LE
        width * height * 3, 0, 0, 0, 0,
    )

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)

    movi_body = b"movi"
    idx_entries = []
    for f in jpeg_frames:
        # idx1 offsets are relative to the start of 'movi' (the kind
        # fourcc), pointing at the chunk tag
        idx_entries.append(len(movi_body))
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)
    idx1 = b"".join(
        b"00dc" + struct.pack("<3I", 0x10, off, len(f))  # AVIIF_KEYFRAME
        for off, f in zip(idx_entries, jpeg_frames)
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_mjpeg_avi(data: bytes) -> tuple[int, int, float, list[bytes]]:
    """Decode an MJPEG AVI -> (width, height, fps, [jpeg_frame_bytes]).

    Walks the RIFF chunk tree; requires a vids stream whose handler or
    biCompression fourcc is MJPEG-family, then collects every
    ``..db``/``..dc`` chunk belonging to THAT stream from the movi
    list (the two-digit chunk prefix is the stream's ordinal in strh
    order — a second audio/text stream's data chunks are ignored, not
    interleaved or fatal). Frames come back as the raw JPEG blobs for
    jpeg.decode_jpeg."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviUnsupported("not a RIFF/AVI stream")

    width = height = None
    fps = 0.0
    handler_ok = False
    frames: list[bytes] = []
    strh_seen = 0       # streams are numbered by strh order in hdrl
    vids_index = None   # ordinal of the MJPEG vids stream
    in_vids_strl = False  # the strf that follows a vids strh

    def walk(buf: bytes, pos: int, end: int, in_movi: bool) -> None:
        nonlocal width, height, fps, handler_ok
        nonlocal strh_seen, vids_index, in_vids_strl
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            size = _u32(buf, pos + 4)
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if tag == b"LIST" and size >= 4:
                kind = buf[body_start : body_start + 4]
                walk(buf, body_start + 4, body_end, in_movi or kind == b"movi")
            elif tag == b"avih" and size >= 40:
                width = _u32(buf, body_start + 32)
                height = _u32(buf, body_start + 36)
            elif tag == b"strh":
                # EVERY strh advances the stream ordinal and resets the
                # strf latch, even a truncated one (size < 36): the
                # ##dc/##db two-digit prefixes count strh chunks in
                # order, so skipping a short strh would misalign
                # vids_index against the movi chunk numbering and a
                # stale in_vids_strl could claim the next stream's strf
                # (round-6 ADVICE). The size guard stays only on the
                # header-field reads.
                fcc_type = (
                    buf[body_start : body_start + 4] if size >= 36 else b""
                )
                fcc_handler = buf[body_start + 4 : body_start + 8]
                in_vids_strl = fcc_type == b"vids"
                if fcc_type == b"vids":
                    if vids_index is not None:
                        raise AviUnsupported("multiple video streams")
                    if fcc_handler not in MJPEG_FOURCCS | {b"\x00\x00\x00\x00"}:
                        raise AviUnsupported(
                            f"video codec {fcc_handler!r} is not MJPEG"
                        )
                    vids_index = strh_seen
                    scale = _u32(buf, body_start + 20)
                    rate = _u32(buf, body_start + 24)
                    if scale:
                        fps = rate / scale
                strh_seen += 1
            elif tag == b"strf" and size >= 40 and in_vids_strl:
                comp = buf[body_start + 16 : body_start + 20]
                if comp in MJPEG_FOURCCS:
                    handler_ok = True
                elif comp not in {b"\x00\x00\x00\x00"}:
                    raise AviUnsupported(f"biCompression {comp!r} is not MJPEG")
            elif in_movi and tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                if vids_index is None or int(tag[:2]) != vids_index:
                    pass  # another stream's data chunk: skip, don't fail
                else:
                    blob = buf[body_start:body_end]
                    if blob[:2] == b"\xff\xd8":
                        frames.append(blob)
                    elif blob:
                        raise AviUnsupported(
                            "movi frame chunk is not a JPEG blob (non-MJPEG data)"
                        )
            pos = body_start + size + (size % 2)

    walk(data, 12, 8 + _u32(data, 4), False)
    if width is None or height is None:
        raise AviUnsupported("missing avih main header")
    if not handler_ok and not frames:
        raise AviUnsupported("no MJPEG video stream found")
    return int(width), int(height), fps, frames
