"""WAV (RIFF/PCM) codec: the audio modality decoded for real, stdlib-only.

Completes the multimodal family next to the PNG/JPEG/GIF image codecs
(``operators/multimodal.py``, ``operators/jpeg.py``, ``operators/gif.py``):
audio payloads ride as opaque ``binary`` columns and are decoded inside
Arrow batches with zero external libraries — RIFF chunk walk + PCM sample
decode are pure ``struct``/numpy, so the seam the container forces on
image work (no libpng/libjpeg) does not exist for canonical WAV at all.

Format scope (honest seams, same contract as the image codecs):

- PCM 16-bit signed and 8-bit unsigned, mono or multi-channel, any sample
  rate — decoded for real, byte-exact round-trip with ``wav_encode``
  (PCM is lossless by construction).
- IEEE float32 (``wFormatTag`` = 3) — decoded for real; samples quantize
  to the common int16 feature dtype via ``rint(x * 32767)`` clipped to
  the int16 range (round-half-even, documented so the oracle twin can
  predict the exact integers).
- IMA ADPCM (``wFormatTag`` = 17, the DVI/IMA 4-bit codec) — decoded for
  real: per-block predictor/step-index headers, the 89-entry step table,
  stereo 4-byte channel interleave, ``fact``-chunk sample-count clipping.
  Blocks are independent, so the decoder is vectorized ACROSS blocks
  (numpy state arrays stepped once per in-block sample position) — the
  same across-independent-units trick the JPEG restart-interval decode
  uses.  ``adpcm_encode`` provides the (lossy) forward direction for
  fixtures and round-trip SNR tests.
- Extensible (0xFFFE) / MP3-in-WAV / other tags raise
  ``NotImplementedError`` — real clusters bring libsndfile for those.
- Not-a-RIFF payload → ``None`` from ``wav_header`` (the caller's
  "unknown codec" row); a RIFF payload whose declared chunk sizes run
  past the buffer → ``ValueError`` (truncation is corruption, not a
  different format — pinned by the cut-at-every-offset test, the same
  contract ``gif_decode`` established).

RIFF details handled: chunk word-alignment (odd-sized chunks carry a pad
byte), unknown chunks (LIST/fact/cue) skipped, ``fmt `` required before
``data``, trailing garbage after ``data`` ignored (scanners append junk).

Feature extraction (``audio_features``) follows the ``extract_features``
shape: ``mapInPandas``, binary in → typed scalar features out, numpy per
batch, malformed rows go NULL rather than failing the batch.  At 100 TB
the same rules as images apply: the metadata struct lets planners prune
without touching sample bytes, and payload files should be written with
``maxRecordsPerFile`` sized so one file ≈ 128-256 MB.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

RIFF_MAGIC = b"RIFF"
WAVE_MAGIC = b"WAVE"

WAV_META_SCHEMA = (
    "codec string, sample_rate int, channels int, bits int, "
    "n_frames long, duration_ms long"
)

# IMA/DVI ADPCM tables (public spec: IMA Digital Audio Pack, 1992; the
# same constants every implementation ships)
IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int32
)


def wav_encode(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Samples → canonical RIFF/WAVE PCM or IEEE-float bytes.

    ``samples``: ``(n,)`` mono or ``(n, channels)`` interleave-ready array;
    dtype int16 for ``bits=16``, uint8 for ``bits=8``, float32 for
    ``bits=32`` (written as ``wFormatTag`` = 3).  Deterministic
    byte-for-byte (header field order fixed, no optional chunks), so
    fixture generators and their oracle twins produce identical files.
    """
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n_frames, channels = a.shape
    tag = 1
    if bits == 16:
        if a.dtype != np.int16:
            raise ValueError(f"pcm16 needs int16 samples, got {a.dtype}")
        body = a.astype("<i2", copy=False).tobytes()
    elif bits == 8:
        if a.dtype != np.uint8:
            raise ValueError(f"pcm8 needs uint8 samples, got {a.dtype}")
        body = a.tobytes()
    elif bits == 32:
        if a.dtype != np.float32:
            raise ValueError(f"float32 needs float32 samples, got {a.dtype}")
        body = a.astype("<f4", copy=False).tobytes()
        tag = 3
    else:
        raise NotImplementedError(f"pcm bits={bits}")
    block_align = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    data_hdr = b"data" + struct.pack("<I", len(body))
    pad = b"\x00" if len(body) % 2 else b""  # RIFF word alignment
    riff_size = 4 + (8 + len(fmt)) + (8 + len(body) + len(pad))
    return (
        RIFF_MAGIC + struct.pack("<I", riff_size) + WAVE_MAGIC
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + data_hdr + body + pad
    )


def adpcm_encode(
    samples: np.ndarray, sample_rate: int, block_frames: int = 505
) -> bytes:
    """int16 samples → RIFF/WAVE IMA ADPCM bytes (``wFormatTag`` = 17).

    The forward (lossy) direction — fixtures and round-trip SNR tests
    only, so it is a clear scalar loop, not a hot path.  Block layout
    matches ``_adpcm_decode_blocks``; the step index carries across
    blocks (each block header re-states it, so decode stays
    block-independent); the final partial block pads by repeating the
    last sample and a ``fact`` chunk records the true frame count.
    """
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n_frames, ch = a.shape
    if n_frames == 0:
        raise ValueError("adpcm: empty sample array")
    if (block_frames - 1) % (8 if ch > 1 else 2):
        raise ValueError(f"adpcm: bad block_frames {block_frames}")
    n_blocks = -(-n_frames // block_frames)
    padded = np.vstack(
        [a, np.repeat(a[-1:], n_blocks * block_frames - n_frames, axis=0)]
    )
    block_align = 4 * ch + (block_frames - 1) * ch // 2
    index = [0] * ch
    blocks = bytearray()
    for b in range(n_blocks):
        blk = padded[b * block_frames:(b + 1) * block_frames]
        nibs: list[list[int]] = []
        for c in range(ch):
            pred = int(blk[0, c])
            blocks += struct.pack("<hBB", pred, index[c], 0)
            cn = []
            for t in range(1, block_frames):
                step = int(IMA_STEP_TABLE[index[c]])
                diff = int(blk[t, c]) - pred
                code = 0
                if diff < 0:
                    code = 8
                    diff = -diff
                if diff >= step:
                    code |= 4
                    diff -= step
                if diff >= step >> 1:
                    code |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    code |= 1
                # reconstruct exactly like the decoder to track pred
                d = step >> 3
                if code & 1:
                    d += step >> 2
                if code & 2:
                    d += step >> 1
                if code & 4:
                    d += step
                if code & 8:
                    d = -d
                pred = max(-32768, min(32767, pred + d))
                index[c] = max(0, min(88, index[c] + int(IMA_INDEX_TABLE[code])))
                cn.append(code)
            nibs.append(cn)
        if ch == 1:
            stream = nibs[0]
        else:
            stream = []
            for g in range(0, block_frames - 1, 8):
                for c in range(ch):
                    stream += nibs[c][g:g + 8]
        for i in range(0, len(stream), 2):
            blocks.append(stream[i] | (stream[i + 1] << 4))
    body = bytes(blocks)
    spb = block_frames
    fmt = struct.pack(
        "<HHIIHHHH", 17, ch, sample_rate,
        sample_rate * block_align // spb, block_align, 4, 2, spb,
    )
    fact = struct.pack("<I", n_frames)
    data_hdr = b"data" + struct.pack("<I", len(body))
    pad = b"\x00" if len(body) % 2 else b""
    riff_size = (
        4 + (8 + len(fmt)) + (8 + len(fact)) + (8 + len(body) + len(pad))
    )
    return (
        RIFF_MAGIC + struct.pack("<I", riff_size) + WAVE_MAGIC
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + data_hdr + body + pad
    )


def riff_chunks(
    payload: bytes, pos: int = 12, end: int | None = None, who: str = "wav"
) -> Iterator[tuple[bytes, int, int]]:
    """Yield (tag, data_offset, data_size) walking RIFF chunks in
    payload[pos:end]; raises ValueError when a chunk header or its
    declared body is cut.  THE one RIFF walk invariant (little-endian
    sizes, odd chunks carry a pad byte, truncation is corruption) —
    shared by the WAV and AVI codecs so their contracts cannot
    diverge."""
    n = len(payload) if end is None else end
    while pos < n:
        if pos + 8 > n:
            raise ValueError(f"{who}: truncated chunk header")
        tag = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + size > n:
            raise ValueError(f"{who}: chunk {tag!r} truncated")
        yield tag, pos + 8, size
        pos += 8 + size + (size % 2)  # odd chunks carry a pad byte


_chunks = riff_chunks  # wav-internal callers below


def wav_header(payload: bytes) -> dict | None:
    """Parse RIFF/fmt/data headers → metadata dict, or None if the payload
    is not a WAV at all.  Does not touch sample bytes."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] != RIFF_MAGIC or payload[8:12] != WAVE_MAGIC:
        return None
    fmt = None
    fact_frames = None
    for tag, off, size in _chunks(payload):
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("wav: fmt chunk too short")
            audio_format, channels, rate, _brate, block_align, bits = (
                struct.unpack_from("<HHIIHH", payload, off)
            )
            if channels < 1:
                raise ValueError("wav: inconsistent fmt chunk")
            if audio_format == 1:
                if bits not in (8, 16):
                    raise NotImplementedError(f"wav: pcm bits={bits}")
                if block_align != channels * (bits // 8):
                    raise ValueError("wav: inconsistent fmt chunk")
                codec, spb = f"pcm{bits}", None
            elif audio_format == 3:
                if bits != 32:
                    raise NotImplementedError(f"wav: float bits={bits}")
                if block_align != channels * 4:
                    raise ValueError("wav: inconsistent fmt chunk")
                codec, spb = "float32", None
            elif audio_format == 17:
                if bits != 4:
                    raise NotImplementedError(f"wav: adpcm bits={bits}")
                if size >= 20:
                    (spb,) = struct.unpack_from("<H", payload, off + 18)
                else:
                    # no extension: derive from the block geometry
                    spb = (block_align - 4 * channels) * 2 // channels + 1
                if (
                    block_align < 4 * channels
                    or spb != (block_align - 4 * channels) * 2
                    // channels + 1
                ):
                    raise ValueError("wav: inconsistent adpcm block")
                codec = "adpcm"
            else:
                raise NotImplementedError(
                    f"wav: unsupported format tag {audio_format}"
                )
            fmt = (codec, channels, rate, bits, block_align, spb)
        elif tag == b"fact":
            if size >= 4:
                (fact_frames,) = struct.unpack_from("<I", payload, off)
        elif tag == b"data":
            if fmt is None:
                raise ValueError("wav: data chunk before fmt")
            codec, channels, rate, bits, block_align, spb = fmt
            if size % block_align:
                raise ValueError("wav: data size not frame-aligned")
            if codec == "adpcm":
                n_frames = (size // block_align) * spb
                if fact_frames is not None:
                    if fact_frames > n_frames:
                        raise ValueError("wav: fact exceeds block capacity")
                    n_frames = fact_frames
            else:
                n_frames = size // block_align
            return {
                "codec": codec,
                "sample_rate": rate,
                "channels": channels,
                "bits": bits,
                "n_frames": n_frames,
                "duration_ms": n_frames * 1000 // rate if rate else 0,
                "_data_off": off,
                "_data_size": size,
                "_block_align": block_align,
                "_spb": spb,
            }
    raise ValueError("wav: no data chunk")


def wav_decode(payload: bytes, meta: dict | None = None) -> np.ndarray:
    """WAV bytes → int16 sample array of shape (n_frames, channels).

    8-bit PCM (stored unsigned, midpoint 128) is recentred and scaled to
    the int16 range (``(v - 128) << 8``); IEEE float32 quantizes via
    ``rint(x * 32767)`` clipped to int16; IMA ADPCM runs the block
    decoder below — so downstream features see one dtype regardless of
    source format.  Pass a ``wav_header`` result as ``meta`` to skip
    re-walking the chunks (the hot-path batch loop already parsed them
    once).
    """
    if meta is None:
        meta = wav_header(payload)
    if meta is None:
        raise ValueError("wav: not a RIFF/WAVE payload")
    off, size = meta["_data_off"], meta["_data_size"]
    ch = meta["channels"]
    codec = meta["codec"]
    if codec == "pcm16":
        a = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=off)
    elif codec == "pcm8":
        u = np.frombuffer(payload, dtype=np.uint8, count=size, offset=off)
        a = (u.astype(np.int16) - 128) << 8
    elif codec == "float32":
        f = np.frombuffer(payload, dtype="<f4", count=size // 4, offset=off)
        a = np.clip(
            np.rint(f.astype(np.float64) * 32767.0), -32768, 32767
        ).astype(np.int16)
    elif codec == "adpcm":
        return _adpcm_decode_blocks(
            payload[off:off + size], ch, meta["_block_align"],
            meta["_spb"], meta["n_frames"],
        )
    else:  # unreachable: wav_header rejects other tags
        raise NotImplementedError(f"wav: codec {codec}")
    return a.reshape(-1, ch)


def _adpcm_decode_blocks(
    data: bytes, ch: int, block_align: int, spb: int, n_frames: int
) -> np.ndarray:
    """IMA ADPCM data chunk → int16 (n_frames, ch).

    Blocks are independent (each carries its own predictor + step index
    per channel), so the sequential recurrence is vectorized ACROSS
    blocks: state arrays of shape (n_blocks, ch) step once per in-block
    sample position.  Layout per block: ch × 4-byte headers (int16
    predictor = sample 0, uint8 step index, reserved), then for mono a
    flat nibble stream (low nibble first), for multi-channel 4-byte
    groups (8 nibbles) round-robin per channel."""
    raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, block_align)
    n_blocks = raw.shape[0]
    # per-channel headers
    hdr = raw[:, : 4 * ch].reshape(n_blocks, ch, 4)
    pred = (
        hdr[:, :, 0].astype(np.uint16)
        | (hdr[:, :, 1].astype(np.uint16) << 8)
    ).view(np.int16).astype(np.int32)
    index = np.clip(hdr[:, :, 2].astype(np.int32), 0, 88)
    # nibble payload → (n_blocks, samples-1, ch) in channel-major order
    body = raw[:, 4 * ch:]
    if ch == 1:
        byte_ch = body[:, :, None]  # (blocks, bytes, 1)
    else:
        # 4-byte groups round-robin per channel
        byte_ch = (
            body.reshape(n_blocks, -1, ch, 4)
            .transpose(0, 1, 3, 2)
            .reshape(n_blocks, -1, ch)
        )
    lo = byte_ch & 0x0F
    hi = byte_ch >> 4
    nibbles = np.empty(
        (n_blocks, 2 * byte_ch.shape[1], ch), dtype=np.uint8
    )
    nibbles[:, 0::2, :] = lo
    nibbles[:, 1::2, :] = hi
    out = np.empty((n_blocks, spb, ch), dtype=np.int16)
    out[:, 0, :] = pred.astype(np.int16)
    for t in range(spb - 1):
        nib = nibbles[:, t, :].astype(np.int32)
        step = IMA_STEP_TABLE[index]
        diff = step >> 3
        diff += np.where(nib & 1, step >> 2, 0)
        diff += np.where(nib & 2, step >> 1, 0)
        diff += np.where(nib & 4, step, 0)
        diff = np.where(nib & 8, -diff, diff)
        pred = np.clip(pred + diff, -32768, 32767)
        index = np.clip(index + IMA_INDEX_TABLE[nib], 0, 88)
        out[:, t + 1, :] = pred.astype(np.int16)
    return out.reshape(-1, ch)[:n_frames]


def wav_features(samples: np.ndarray) -> tuple[float, int, int]:
    """(rms, peak, zero_crossings) over an int16 (n_frames, channels)
    array — the numpy expressions the oracle twin runs verbatim.

    rms: float64 sqrt(mean(x²)) over ALL channels; peak: max |x| (int32
    math — |int16 -32768| overflows int16); zero_crossings: signbit flips
    between consecutive frames of channel 0.
    """
    x = samples.astype(np.int32)
    rms = float(np.sqrt(np.mean(np.float64(x) ** 2))) if x.size else 0.0
    peak = int(np.max(np.abs(x))) if x.size else 0
    c0 = samples[:, 0]
    zcr = int(np.count_nonzero(np.signbit(c0[:-1]) != np.signbit(c0[1:])))
    return rms, peak, zcr


def audio_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach WAV metadata + signal features by decoding in Arrow batches.

    Appends ``WAV_META_SCHEMA`` columns plus ``rms double, peak int,
    zero_crossings int``.  Non-WAV payloads get a NULL codec row;
    truncated/unsupported WAVs also go NULL (the batch never fails) —
    same malformed-row contract as ``extract_features``.
    """
    cols = df.columns
    feat_names = (
        "codec", "sample_rate", "channels", "bits", "n_frames",
        "duration_ms", "rms", "peak", "zero_crossings",
    )

    def _run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            rows = []
            for p in pdf[payload_col]:
                try:
                    meta = wav_header(p)
                except (ValueError, NotImplementedError):
                    meta = None
                if meta is None:
                    rows.append((None,) * len(feat_names))
                    continue
                rms, peak, zcr = wav_features(wav_decode(p, meta))
                rows.append((
                    meta["codec"], meta["sample_rate"], meta["channels"],
                    meta["bits"], meta["n_frames"], meta["duration_ms"],
                    rms, peak, zcr,
                ))
            for i, name in enumerate(feat_names):
                out[name] = [r[i] for r in rows]
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + WAV_META_SCHEMA + ", rms double, peak int, zero_crossings int"
    return df.mapInPandas(_run, schema=schema)
