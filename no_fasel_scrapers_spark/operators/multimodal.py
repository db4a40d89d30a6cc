"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested.  Actual codec work (JPEG decode, resampling,
frame extraction) requires libs not present in this container — those steps
are STUBBED behind ``_decode_image_real`` (raises NotImplementedError) with
a deterministic fake-codec path used by tests: payloads produced by
``fake_encode`` carry a parseable header, so decode/resize/feature-extract
exercise the full distributed path with verifiable outputs.

Batch shape: ``mapInPandas`` with binary columns yields ``bytes`` objects
per cell; numpy does the per-batch work.  Partitioning: media tables should
be written with ``maxRecordsPerFile`` tuned so one file ≈ 128-256 MB of
payload; the metadata struct lets planners prune without touching bytes.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"NFSI"  # fake-codec magic: NFSI | u16 w | u16 h | u8 channels | raw

META_SCHEMA = "width int, height int, channels int, n_bytes long, codec string"


def fake_encode(width: int, height: int, channels: int, seed: int) -> bytes:
    """Deterministic fake image payload (tests/bench only)."""
    n = width * height * channels
    rng = np.arange(n, dtype=np.uint32) * np.uint32(2654435761) + np.uint32(seed)
    body = (rng >> 24).astype(np.uint8).tobytes()
    return MAGIC + struct.pack("<HHB", width, height, channels) + body


def _decode_image_real(payload: bytes):
    """Real codec path — requires PIL/libjpeg, absent in this sandbox."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode needs PIL/libjpeg; use the fake-codec path "
            "(fake_encode) in this environment"
        ) from e
    raise NotImplementedError("real decode wiring lands with the codec libs")


def decode_header(payload: bytes) -> dict:
    if payload is None or len(payload) < 9 or payload[:4] != MAGIC:
        return {"width": None, "height": None, "channels": None,
                "n_bytes": None if payload is None else len(payload),
                "codec": "unknown"}
    w, h, c = struct.unpack("<HHB", payload[4:9])
    return {"width": w, "height": h, "channels": c,
            "n_bytes": len(payload), "codec": "nfsi-fake"}


def with_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach the typed metadata struct by parsing headers in Arrow batches."""
    cols = df.columns

    def _run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            metas = [decode_header(p) for p in pdf[payload_col]]
            for k in ("width", "height", "channels", "n_bytes", "codec"):
                out[k] = [m[k] for m in metas]
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + META_SCHEMA
    return df.mapInPandas(_run, schema=schema)


def extract_features(
    df: DataFrame, payload_col: str = "payload", n_bins: int = 16
) -> DataFrame:
    """Byte-histogram feature vector per payload (the fake 'embedding').

    Shape of a real feature extractor: binary in → fixed-length
    array<float> out, numpy per batch."""
    cols = df.columns

    def _run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            feats = []
            for p in pdf[payload_col]:
                if p is None or len(p) <= 9 or p[:4] != MAGIC:
                    feats.append(None)
                    continue
                body = np.frombuffer(p, dtype=np.uint8, offset=9)
                hist, _ = np.histogram(body, bins=n_bins, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).astype(np.float32).tolist())
            out["features"] = feats
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", features array<float>"
    return df.mapInPandas(_run, schema=schema)


def resize_stub(
    df: DataFrame, payload_col: str = "payload", width: int = 64, height: int = 64
) -> DataFrame:
    """Resize on the fake codec: nearest-neighbor over the raw body —
    demonstrates payload-rewriting UDF shape (binary in → binary out)."""
    cols = df.columns

    def _run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            resized = []
            for p in pdf[payload_col]:
                m = decode_header(p)
                if m["codec"] != "nfsi-fake":
                    resized.append(None)
                    continue
                w, h, c = m["width"], m["height"], m["channels"]
                body = np.frombuffer(p, dtype=np.uint8, offset=9).reshape(h, w, c)
                yi = (np.arange(height) * h // height)
                xi = (np.arange(width) * w // width)
                small = body[yi][:, xi]
                resized.append(
                    MAGIC + struct.pack("<HHB", width, height, c) + small.tobytes()
                )
            out["resized"] = resized
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", resized binary"
    return df.mapInPandas(_run, schema=schema)
