"""WAV (RIFF/PCM) codec: round-trip exactness, RIFF edge cases, the
truncation contract, and the Spark ``audio_features`` operator.

PCM is lossless, so encode→decode must be bit-exact — no tolerance
anywhere.  The malformed-payload contract matches the image codecs
(tests/test_gif_codec.py): ValueError/NotImplementedError only, never
struct.error/IndexError, at EVERY cut offset."""

import struct

import numpy as np
import pytest

from no_fasel_scrapers_spark.operators.wav import (
    audio_features,
    wav_decode,
    wav_encode,
    wav_features,
    wav_header,
)


def _sig16(n, seed=7, channels=1):
    rng = (
        np.arange(n * channels, dtype=np.uint32) * np.uint32(2654435761)
        + np.uint32(seed)
    )
    a = ((rng >> 8) & np.uint32(0xFFFF)).astype(np.uint16).view(np.int16)
    return a.reshape(n, channels)


def test_roundtrip_pcm16_mono_bit_exact():
    s = _sig16(501)  # odd byte count is impossible at 16-bit; 501 frames
    payload = wav_encode(s, 16000)
    out = wav_decode(payload)
    assert out.shape == (501, 1)
    assert np.array_equal(out, s)


def test_roundtrip_pcm16_stereo_interleave():
    s = _sig16(200, channels=2)
    payload = wav_encode(s, 44100)
    out = wav_decode(payload)
    assert out.shape == (200, 2)
    assert np.array_equal(out, s)
    # interleave order: frame-major (L0 R0 L1 R1 ...)
    raw = np.frombuffer(payload[-800:], dtype="<i2")
    assert np.array_equal(raw.reshape(200, 2), s)


def test_roundtrip_pcm8_recentres_to_int16():
    u = (np.arange(301) % 256).astype(np.uint8)
    payload = wav_encode(u, 8000, bits=8)
    out = wav_decode(payload)
    assert out.shape == (301, 1)
    assert np.array_equal(out[:, 0], (u.astype(np.int16) - 128) << 8)
    # odd-sized data chunk: the pad byte must be present for alignment
    assert len(payload) % 2 == 0


def test_header_fields():
    meta = wav_header(wav_encode(_sig16(320, channels=2), 16000))
    assert meta["codec"] == "pcm16"
    assert meta["sample_rate"] == 16000
    assert meta["channels"] == 2
    assert meta["bits"] == 16
    assert meta["n_frames"] == 320
    assert meta["duration_ms"] == 20  # 320 / 16000 s


def test_unknown_chunks_skipped_and_odd_chunk_padded():
    # splice a 5-byte (odd) LIST chunk between fmt and data; the walker
    # must skip it INCLUDING the pad byte to stay aligned
    base = wav_encode(_sig16(50), 8000)
    data_at = base.index(b"data")
    spliced = (
        base[:data_at] + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        + base[data_at:]
    )
    # fix the RIFF size field (not actually validated, but keep it honest)
    meta = wav_header(spliced)
    assert meta["n_frames"] == 50
    assert np.array_equal(wav_decode(spliced), _sig16(50))


def test_trailing_garbage_after_data_ignored():
    base = wav_encode(_sig16(50), 8000)
    assert np.array_equal(wav_decode(base + b"JUNKJUNK"), _sig16(50))


def test_non_pcm_format_raises_honestly():
    payload = bytearray(wav_encode(_sig16(10), 8000))
    fmt_at = payload.index(b"fmt ") + 8
    struct.pack_into("<H", payload, fmt_at, 3)  # IEEE float tag
    with pytest.raises(NotImplementedError):
        wav_header(bytes(payload))


def test_unsupported_bit_depth_raises_honestly():
    payload = bytearray(wav_encode(_sig16(10), 8000))
    fmt_at = payload.index(b"fmt ") + 8
    struct.pack_into("<H", payload, fmt_at + 14, 24)   # bits
    struct.pack_into("<H", payload, fmt_at + 12, 3)    # block_align 1*3
    with pytest.raises(NotImplementedError):
        wav_header(bytes(payload))
    with pytest.raises(NotImplementedError):
        wav_encode(_sig16(4), 8000, bits=24)


def test_encode_rejects_mismatched_dtype():
    # silent astype would wrap/truncate samples into a structurally valid
    # but garbage WAV — the encoder must raise instead
    with pytest.raises(ValueError):
        wav_encode(_sig16(4), 8000, bits=8)
    with pytest.raises(ValueError):
        wav_encode(np.zeros(4, np.float32), 8000)
    with pytest.raises(ValueError):
        wav_encode((np.arange(4) % 256).astype(np.uint8), 8000, bits=16)


def test_decode_accepts_precomputed_meta():
    payload = wav_encode(_sig16(20), 8000)
    meta = wav_header(payload)
    assert np.array_equal(wav_decode(payload, meta), wav_decode(payload))


def test_not_a_wav_is_none_not_error():
    assert wav_header(None) is None
    assert wav_header(b"") is None
    assert wav_header(b"RIFF\x00\x00\x00\x00AVI ") is None  # RIFF, not WAVE
    assert wav_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16) is None
    with pytest.raises(ValueError):
        wav_decode(b"not audio")


def test_misaligned_data_size_raises():
    payload = bytearray(wav_encode(_sig16(10, channels=2), 8000))
    data_at = payload.index(b"data")
    struct.pack_into("<I", payload, data_at + 4, 39)  # not /4 frames... cut
    # shrinking the declared size below the buffer is legal RIFF (trailing
    # bytes become slack) but 39 is not frame-aligned for 2ch x 16-bit
    with pytest.raises(ValueError):
        wav_header(bytes(payload))


def test_truncation_always_raises_value_error_never_struct_or_index():
    payload = wav_encode(_sig16(33), 8000)
    for cut in range(len(payload)):
        p = payload[:cut]
        try:
            wav_decode(p)
        except (ValueError, NotImplementedError):
            pass
        # any other exception type propagates and fails the test
        h = None
        try:
            h = wav_header(p)
        except (ValueError, NotImplementedError):
            pass
        assert h is None or cut == len(payload)


def test_features_rms_peak_zcr():
    s = np.array([[100], [-200], [300], [0], [-32768]], dtype=np.int16)
    rms, peak, zcr = wav_features(s)
    assert peak == 32768  # |int16 min| needs int32 math
    assert rms == pytest.approx(
        float(np.sqrt(np.mean(np.float64([100, -200, 300, 0, -32768]) ** 2)))
    )
    # signbit flips: +,-,+,+(0),-  →  3 crossings
    assert zcr == 3


def test_features_empty_and_stereo_channel0():
    rms, peak, zcr = wav_features(np.empty((0, 1), dtype=np.int16))
    assert (rms, peak, zcr) == (0.0, 0, 0)
    st = np.array([[1, -1], [-1, -1], [1, -1]], dtype=np.int16)
    assert wav_features(st)[2] == 2  # crossings counted on channel 0 only


def test_audio_features_operator_nulls_and_values(spark):
    import pandas as pd

    w16 = wav_encode(_sig16(64), 16000)
    w8 = wav_encode((np.arange(65) % 256).astype(np.uint8), 8000, bits=8)
    stereo = wav_encode(_sig16(32, channels=2), 44100)
    nonpcm = bytearray(w16)
    struct.pack_into("<H", nonpcm, nonpcm.index(b"fmt ") + 8, 3)
    rows = [
        (0, w16), (1, w8), (2, stereo),
        (3, b"not audio"), (4, None), (5, bytes(nonpcm)),
        (6, w16[: len(w16) // 2]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["doc_id"]: r
        for r in audio_features(df).collect()
    }
    assert out[0]["codec"] == "pcm16" and out[0]["n_frames"] == 64
    assert out[1]["codec"] == "pcm8" and out[1]["sample_rate"] == 8000
    assert out[2]["channels"] == 2 and out[2]["duration_ms"] == 0  # 32/44100
    for bad in (3, 4, 5, 6):  # non-wav, NULL, non-PCM, truncated → NULL row
        assert out[bad]["codec"] is None and out[bad]["rms"] is None
    rms, peak, zcr = wav_features(wav_decode(w16))
    assert out[0]["rms"] == rms
    assert out[0]["peak"] == peak
    assert out[0]["zero_crossings"] == zcr
    # passthrough columns survive
    assert sorted(out) == [0, 1, 2, 3, 4, 5, 6]
    assert isinstance(audio_features(df).toPandas(), pd.DataFrame)
