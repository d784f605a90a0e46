"""Pure-stdlib WAV/PCM codec — the audio sibling of png.py: makes the
audio decode path REAL for RIFF/WAVE PCM inputs while compressed
formats (mp3/aac/opus) stay behind DecodeUnavailable gates.

Scope: canonical RIFF/WAVE with PCM integer samples at 8 or 16 bits,
any channel count/sample rate, chunks in any order (fmt before data,
extra chunks like LIST/fact skipped). IEEE-float or compressed
`wAVE_FORMAT_*` codecs raise WavUnsupported.

The encoder builds canonical 44-byte-header mono/stereo PCM files for
tests; with_media_metadata's expression-level fields (sample rate,
duration) assume that canonical layout and the decoder here does not.
"""

from __future__ import annotations

import struct


class WavUnsupported(ValueError):
    """Valid RIFF/WAVE, but outside the supported PCM profile."""


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """Decode WAV bytes -> (sample_rate, channels, sample_width_bytes,
    samples). Samples are interleaved ints: signed for 16-bit,
    UNSIGNED 0..255 for 8-bit (the WAV on-disk conventions, surfaced
    unchanged so tests can pin exact values)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if len(body) != size:
                raise ValueError("truncated data chunk")
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_format != 1:
        raise WavUnsupported(f"audio format {audio_format} (only PCM=1)")
    if bits == 16:
        n = len(pcm) // 2
        samples = list(struct.unpack(f"<{n}h", pcm[: 2 * n]))
        width = 2
    elif bits == 8:
        samples = list(pcm)
        width = 1
    else:
        raise WavUnsupported(f"{bits}-bit PCM (only 8/16)")
    return sample_rate, channels, width, samples


def encode_wav(
    samples: list[int], *, sample_rate: int = 16000, channels: int = 1
) -> bytes:
    """Canonical 44-byte-header 16-bit PCM WAV from interleaved signed
    samples — the test-fixture builder."""
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def to_mono(samples: list[int], channels: int) -> list[int]:
    """Channel-mean downmix with floor division — deterministic
    integer math, no FP."""
    if channels == 1:
        return samples
    n = len(samples) // channels
    return [
        sum(samples[i * channels : (i + 1) * channels]) // channels
        for i in range(n)
    ]


def window_features(
    mono: list[int], *, frame: int, hop: int, full_scale: float = 32768.0
) -> list[tuple[int, float, float, float]]:
    """Per-window (start_sample, rms, zero_crossing_rate, peak) over a
    mono PCM stream — the classic cheap audio features (VAD/silence
    trim/level normalization inputs for a training-data pipeline).
    Values normalized to full scale; short trailing windows are
    emitted (consistent with audio_frame_windows's byte framing)."""
    out = []
    n = len(mono)
    if n == 0:
        return out
    # same start grid as audio_frame_windows's byte framing: full
    # windows only once n >= frame; a single short window otherwise
    last_start = max(n - frame, 0)
    for start in range(0, last_start + 1, hop):
        seg = mono[start : start + frame]
        acc = 0
        peak = 0
        zc = 0
        prev_neg = seg[0] < 0
        for s in seg:
            acc += s * s
            a = -s if s < 0 else s
            if a > peak:
                peak = a
            neg = s < 0
            if neg != prev_neg:
                zc += 1
            prev_neg = neg
        rms = (acc / len(seg)) ** 0.5 / full_scale
        zcr = zc / len(seg)
        out.append((start, rms, zcr, peak / full_scale))
    return out
