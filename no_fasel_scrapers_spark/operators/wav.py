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
- IEEE-float / ADPCM / extensible (``wFormatTag`` != 1) raise
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


def wav_encode(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Samples → canonical RIFF/WAVE PCM bytes.

    ``samples``: ``(n,)`` mono or ``(n, channels)`` interleave-ready array;
    dtype int16 for ``bits=16``, uint8 for ``bits=8``.  Deterministic
    byte-for-byte (header field order fixed, no optional chunks), so
    fixture generators and their oracle twins produce identical files.
    """
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n_frames, channels = a.shape
    if bits == 16:
        if a.dtype != np.int16:
            raise ValueError(f"pcm16 needs int16 samples, got {a.dtype}")
        body = a.astype("<i2", copy=False).tobytes()
    elif bits == 8:
        if a.dtype != np.uint8:
            raise ValueError(f"pcm8 needs uint8 samples, got {a.dtype}")
        body = a.tobytes()
    else:
        raise NotImplementedError(f"pcm bits={bits}")
    block_align = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
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
    for tag, off, size in _chunks(payload):
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("wav: fmt chunk too short")
            audio_format, channels, rate, _brate, block_align, bits = (
                struct.unpack_from("<HHIIHH", payload, off)
            )
            if audio_format != 1:
                raise NotImplementedError(
                    f"wav: non-PCM format tag {audio_format}"
                )
            if bits not in (8, 16):
                raise NotImplementedError(f"wav: pcm bits={bits}")
            if channels < 1 or block_align != channels * (bits // 8):
                raise ValueError("wav: inconsistent fmt chunk")
            fmt = (channels, rate, bits, block_align)
        elif tag == b"data":
            if fmt is None:
                raise ValueError("wav: data chunk before fmt")
            channels, rate, bits, block_align = fmt
            if size % block_align:
                raise ValueError("wav: data size not frame-aligned")
            n_frames = size // block_align
            return {
                "codec": f"pcm{bits}",
                "sample_rate": rate,
                "channels": channels,
                "bits": bits,
                "n_frames": n_frames,
                "duration_ms": n_frames * 1000 // rate if rate else 0,
                "_data_off": off,
                "_data_size": size,
            }
    raise ValueError("wav: no data chunk")


def wav_decode(payload: bytes, meta: dict | None = None) -> np.ndarray:
    """WAV bytes → int16 sample array of shape (n_frames, channels).

    8-bit PCM (stored unsigned, midpoint 128) is recentred and scaled to
    the int16 range (``(v - 128) << 8``) so downstream features see one
    dtype regardless of source depth.  Pass a ``wav_header`` result as
    ``meta`` to skip re-walking the chunks (the hot-path batch loop
    already parsed them once).
    """
    if meta is None:
        meta = wav_header(payload)
    if meta is None:
        raise ValueError("wav: not a RIFF/WAVE payload")
    off, size = meta["_data_off"], meta["_data_size"]
    ch = meta["channels"]
    if meta["bits"] == 16:
        a = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=off)
    else:
        u = np.frombuffer(payload, dtype=np.uint8, count=size, offset=off)
        a = (u.astype(np.int16) - 128) << 8
    return a.reshape(-1, ch)


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
