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


def test_unsupported_format_raises_honestly():
    # tag 2 (MS ADPCM) and 0xFFFE (extensible) stay honest stubs; tag 3
    # with a non-float32 bit depth is likewise rejected, not guessed at
    for tag in (2, 0xFFFE):
        payload = bytearray(wav_encode(_sig16(10), 8000))
        fmt_at = payload.index(b"fmt ") + 8
        struct.pack_into("<H", payload, fmt_at, tag)
        with pytest.raises(NotImplementedError):
            wav_header(bytes(payload))
    payload = bytearray(wav_encode(_sig16(10), 8000))
    fmt_at = payload.index(b"fmt ") + 8
    struct.pack_into("<H", payload, fmt_at, 3)  # float tag, 16-bit depth
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


# ---------------------------------------------------------------------------
# IEEE float32 (wFormatTag = 3)
# ---------------------------------------------------------------------------

def _sigf(n, seed=3, channels=1):
    rng = (
        np.arange(n * channels, dtype=np.uint32) * np.uint32(2654435761)
        + np.uint32(seed)
    )
    f = (rng >> 8).astype(np.float64) / float(1 << 23) - 1.0  # [-1, 1)
    return f.astype(np.float32).reshape(n, channels)


def test_float32_decode_quantization_exact():
    f = _sigf(64)
    w = wav_encode(f, 48000, bits=32)
    meta = wav_header(w)
    assert meta["codec"] == "float32" and meta["bits"] == 32
    assert meta["n_frames"] == 64 and meta["sample_rate"] == 48000
    expect = np.clip(
        np.rint(f.astype(np.float64) * 32767.0), -32768, 32767
    ).astype(np.int16)
    assert np.array_equal(wav_decode(w), expect)


def test_float32_out_of_range_clips_not_wraps():
    f = np.array([2.0, -2.0, 1.0, -1.0], dtype=np.float32)
    got = wav_decode(wav_encode(f, 8000, bits=32))[:, 0]
    assert got.tolist() == [32767, -32768, 32767, -32767]


def test_float32_stereo_interleave():
    f = _sigf(16, channels=2)
    got = wav_decode(wav_encode(f, 8000, bits=32))
    assert got.shape == (16, 2)
    mono_l = wav_decode(wav_encode(np.ascontiguousarray(f[:, 0]), 8000, bits=32))
    assert np.array_equal(got[:, 0], mono_l[:, 0])


# ---------------------------------------------------------------------------
# IMA ADPCM (wFormatTag = 17)
# ---------------------------------------------------------------------------

from no_fasel_scrapers_spark.operators.wav import (  # noqa: E402
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    adpcm_encode,
)


def _adpcm_decode_scalar(payload):
    """Independent scalar mirror of the IMA block decode (the spec's
    per-sample recurrence verbatim) — what the vectorized decoder must
    equal bit-for-bit."""
    meta = wav_header(payload)
    ch, ba, spb = meta["channels"], meta["_block_align"], meta["_spb"]
    data = payload[meta["_data_off"]:meta["_data_off"] + meta["_data_size"]]
    out = []
    for boff in range(0, len(data), ba):
        blk = data[boff:boff + ba]
        preds, idxs = [], []
        for c in range(ch):
            p, i, _r = struct.unpack_from("<hBB", blk, 4 * c)
            preds.append(p)
            idxs.append(min(88, max(0, i)))
        nibs = [[] for _ in range(ch)]
        body = blk[4 * ch:]
        if ch == 1:
            stream = []
            for byte in body:
                stream += [byte & 0x0F, byte >> 4]
            nibs[0] = stream
        else:
            for g in range(0, len(body), 4 * ch):
                for c in range(ch):
                    for byte in body[g + 4 * c:g + 4 * c + 4]:
                        nibs[c] += [byte & 0x0F, byte >> 4]
        frames = [[preds[c] for c in range(ch)]]
        for t in range(spb - 1):
            row = []
            for c in range(ch):
                nib = nibs[c][t]
                step = int(IMA_STEP_TABLE[idxs[c]])
                d = step >> 3
                if nib & 1:
                    d += step >> 2
                if nib & 2:
                    d += step >> 1
                if nib & 4:
                    d += step
                if nib & 8:
                    d = -d
                preds[c] = max(-32768, min(32767, preds[c] + d))
                idxs[c] = max(0, min(88, idxs[c] + int(IMA_INDEX_TABLE[nib])))
                row.append(preds[c])
            frames.append(row)
        out += frames
    return np.array(out, dtype=np.int16)[: meta["n_frames"]]


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("n", [505, 600, 1515, 64])
def test_adpcm_vectorized_decode_equals_scalar_spec(channels, n):
    w = adpcm_encode(_sig16(n, channels=channels), 8000)
    meta = wav_header(w)
    assert meta["codec"] == "adpcm" and meta["n_frames"] == n
    assert np.array_equal(wav_decode(w, meta), _adpcm_decode_scalar(w))


def test_adpcm_roundtrip_tracks_signal():
    # a smooth signal ADPCM can follow: reconstruction error far below
    # full scale (IMA is ~4:1 lossy, not exact)
    t = np.arange(2048, dtype=np.float64)
    sig = (8000 * np.sin(t / 16) + 2000 * np.sin(t / 5)).astype(np.int16)
    got = wav_decode(adpcm_encode(sig, 16000))[:, 0].astype(np.float64)
    err = got - sig.astype(np.float64)
    assert np.sqrt(np.mean(err**2)) < 400  # ~1.2% of full scale


def test_adpcm_fact_clips_padded_final_block():
    n = 600  # pads to 2 blocks of 505
    w = adpcm_encode(_sig16(n), 8000)
    meta = wav_header(w)
    assert meta["n_frames"] == n
    assert wav_decode(w, meta).shape == (n, 1)
    # without the fact chunk the capacity would be 1010 frames
    assert meta["_data_size"] // meta["_block_align"] * meta["_spb"] == 1010


def test_adpcm_fact_exceeding_capacity_raises():
    w = bytearray(adpcm_encode(_sig16(505), 8000))
    at = w.index(b"fact") + 8
    struct.pack_into("<I", w, at, 10_000)
    with pytest.raises(ValueError):
        wav_header(bytes(w))


def test_adpcm_truncation_raises_value_error():
    w = adpcm_encode(_sig16(505, channels=2), 8000)
    for cut in range(12, len(w), 97):
        try:
            wav_header(w[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_adpcm_inconsistent_block_geometry_raises():
    w = bytearray(adpcm_encode(_sig16(505), 8000))
    fmt_at = w.index(b"fmt ") + 8
    struct.pack_into("<H", w, fmt_at + 18, 99)  # spb that mismatches align
    with pytest.raises(ValueError):
        wav_header(bytes(w))


def test_audio_features_decodes_float_and_adpcm(spark):
    f = _sigf(128)
    w_f = wav_encode(f, 48000, bits=32)
    sig = _sig16(505)
    w_a = adpcm_encode(sig, 8000)
    df = spark.createDataFrame(
        [(0, w_f), (1, w_a)], "doc_id long, payload binary"
    )
    out = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert out[0]["codec"] == "float32" and out[0]["n_frames"] == 128
    assert out[1]["codec"] == "adpcm" and out[1]["n_frames"] == 505
    rms, peak, zcr = wav_features(wav_decode(w_a))
    assert (out[1]["rms"], out[1]["peak"], out[1]["zero_crossings"]) == (
        rms, peak, zcr,
    )
