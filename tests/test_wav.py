"""Pure-stdlib WAV codec + windowed audio features (the audio sibling
of test_png.py): real PCM decode through the multimodal path."""

from __future__ import annotations

import math
import struct

import pytest

from firmable_aus_etl_spark.multimodal import wav as W


def sine16(n, *, freq=440, rate=16000, amp=16000):
    return [
        int(round(amp * math.sin(2 * math.pi * freq * i / rate)))
        for i in range(n)
    ]


def test_round_trip_mono():
    s = sine16(800)
    data = W.encode_wav(s, sample_rate=16000, channels=1)
    rate, ch, width, out = W.decode_wav(data)
    assert (rate, ch, width) == (16000, 1, 2)
    assert out == s


def test_round_trip_stereo_and_downmix():
    left = sine16(400)
    right = [s // 2 for s in left]
    interleaved = [v for pair in zip(left, right) for v in pair]
    data = W.encode_wav(interleaved, sample_rate=8000, channels=2)
    rate, ch, width, out = W.decode_wav(data)
    assert (rate, ch) == (8000, 2)
    mono = W.to_mono(out, 2)
    assert mono == [(a + b) // 2 for a, b in zip(left, right)]


def test_extra_chunks_skipped():
    s = sine16(100)
    data = W.encode_wav(s)
    # splice a LIST chunk between fmt and data
    head, rest = data[:36], data[36:]
    listbody = b"INFOISFT" + struct.pack("<I", 5) + b"test\x00" + b"\x00"
    spliced = head + b"LIST" + struct.pack("<I", len(listbody)) + listbody + rest
    rate, ch, width, out = W.decode_wav(spliced)
    assert out == s


def test_8bit_pcm():
    # hand-built 8-bit file: unsigned samples around the 128 midpoint
    pcm = bytes([128, 255, 0, 128])
    data = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    rate, ch, width, out = W.decode_wav(data)
    assert (rate, ch, width) == (8000, 1, 1)
    assert out == [128, 255, 0, 128]


def test_unsupported_and_malformed():
    s = sine16(10)
    good = W.encode_wav(s)
    # IEEE float format (3) -> unsupported
    bad = bytearray(good)
    bad[20] = 3
    with pytest.raises(W.WavUnsupported):
        W.decode_wav(bytes(bad))
    with pytest.raises(ValueError):
        W.decode_wav(b"RIFFxxxxWAVE")  # no chunks
    with pytest.raises(ValueError):
        W.decode_wav(b"OggS" + good[4:])  # wrong container


def test_window_features_known_values():
    # constant full-scale-half signal: rms = peak = amp/32768, zcr = 0
    const = [16384] * 400
    feats = W.window_features(const, frame=200, hop=100)
    assert [f[0] for f in feats] == [0, 100, 200]
    for _, rms, zcr, peak in feats:
        assert abs(rms - 0.5) < 1e-9
        assert zcr == 0.0
        assert abs(peak - 0.5) < 1e-9
    # sine: rms ~ amp/sqrt(2), zcr ~ 2*freq/rate
    s = sine16(1600, freq=400, rate=16000, amp=16000)
    (start, rms, zcr, peak), *_ = W.window_features(s, frame=1600, hop=1600)
    assert abs(rms - (16000 / 32768.0) / math.sqrt(2)) < 0.01
    assert abs(zcr - 2 * 400 / 16000) < 0.01
    # short input: one short window
    assert len(W.window_features([1, 2, 3], frame=10, hop=5)) == 1


def test_audio_features_real_wav(spark):
    from firmable_aus_etl_spark.multimodal.ops import audio_features

    tone = W.encode_wav(sine16(3200, freq=200), sample_rate=16000)
    silence = W.encode_wav([0] * 3200, sample_rate=16000)
    df = spark.createDataFrame(
        [(1, tone), (2, silence)], "media_id long, content binary"
    )
    rows = audio_features(df, frame_samples=1600, hop_samples=800).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    # full windows at starts 0, 800, 1600 -> 3 windows per clip
    assert sorted(r.start_sample for r in by_id[1]) == [0, 800, 1600]
    tone_rms = [r.rms for r in by_id[1]]
    assert all(abs(v - (16000 / 32768.0) / math.sqrt(2)) < 0.02 for v in tone_rms)
    assert all(r.rms == 0.0 and r.zcr == 0.0 for r in by_id[2])


def test_audio_features_gated_for_non_wav(spark):
    from firmable_aus_etl_spark.multimodal.ops import audio_features

    df = spark.createDataFrame(
        [(1, b"\xff\xfb\x90\x00mp3data")], "media_id long, content binary"
    )
    with pytest.raises(Exception) as ei:
        audio_features(df).collect()
    assert "DecodeUnavailable" in str(ei.value) or "decode" in str(ei.value)


def test_media_metadata_wav_extra_chunk_keeps_null_meta(spark):
    """ADVICE r4 (low): a RIFF/WAVE file with an extra chunk between
    fmt and data (e.g. 'fact') is NOT canonical 44-byte layout; the
    expression-level sniffer must keep null meta rather than read the
    extra chunk's header as the data size (wrong duration_ms)."""
    import struct

    from firmable_aus_etl_spark.multimodal import MEDIA_SCHEMA, with_media_metadata

    canon = W.encode_wav([0] * 16000, sample_rate=16000)
    # splice a 4-byte 'fact' chunk between fmt (ends at byte 36) and data
    fact = b"fact" + struct.pack("<I", 4) + struct.pack("<I", 16000)
    patched = canon[:36] + fact + canon[36:]
    # fix the RIFF size field (bytes 4..8) for the inserted 12 bytes
    patched = (
        patched[:4]
        + struct.pack("<I", struct.unpack("<I", canon[4:8])[0] + len(fact))
        + patched[8:]
    )
    rows = [(1, "a://t.wav", None, None, bytearray(patched), None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = with_media_metadata(df).collect()[0]
    assert out.mime == "audio/wav"  # still recognizably WAV...
    assert out.meta is None or out.meta.duration_ms is None  # ...but no fake duration
    # the chunk-walking real parser still decodes it correctly
    sr, _ch, _w, samples = W.decode_wav(bytes(patched))
    assert sr == 16000 and len(samples) == 16000


def test_media_metadata_wav_fields(spark):
    from firmable_aus_etl_spark.multimodal import MEDIA_SCHEMA, with_media_metadata

    one_sec = W.encode_wav([0] * 16000, sample_rate=16000)
    rows = [(1, "a://t.wav", None, None, bytearray(one_sec), None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = with_media_metadata(df).collect()[0]
    assert out.mime == "audio/wav"
    assert out.meta.sample_rate == 16000
    assert out.meta.duration_ms == 1000
