"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested.  Four codecs decode for real in-sandbox:

- **PNG** — a stdlib-only (zlib + struct) decoder: chunk walk, IHDR parse,
  IDAT inflate, full scanline unfiltering (filter types 0-4 incl. Paeth)
  for 8-bit gray / gray+alpha / RGB / RGBA / palette (PLTE expansion to
  RGB, round 5).  ``_decode_image_real`` returns
  the pixel array; ``png_encode`` writes spec-compliant files for fixtures.
- **JPEG** — a stdlib+numpy DCT codec (``operators/jpeg.py``): marker
  walk, canonical Huffman, dequant + IDCT, chroma upsampling.  Baseline
  sequential (SOF0) AND progressive (SOF2, spectral selection +
  successive approximation) decode for real; arithmetic/extended
  honestly raise (``jpeg_header`` still reads their dimensions).
- **GIF** — a stdlib+numpy LZW codec (``operators/gif.py``): screen
  descriptor, global/local color tables, extension skipping, real LZW
  both directions (width growth to 12 bits, table-full clears); first
  frame decodes to palette-expanded RGB incl. the four-pass interlace
  reorder (round 5).
- the deterministic **fake codec** (``fake_encode``) used where a real
  format would add nothing to the plumbing under test.

Audio decodes for real too (RIFF/PCM WAV, ``operators/wav.py``), as does
one real video container — MJPEG-in-AVI (``operators/avi.py``: RIFF walk
+ the JPEG codec per frame, consumed by ``sample_frames``).  Inter-frame
video codecs (mp4/h264) require libs not present in this container and
stay stubbed behind clear ``NotImplementedError`` seams.

Batch shape: ``mapInPandas`` with binary columns yields ``bytes`` objects
per cell; numpy does the per-batch work.  Partitioning: media tables should
be written with ``maxRecordsPerFile`` tuned so one file ≈ 128-256 MB of
payload; the metadata struct lets planners prune without touching bytes.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from no_fasel_scrapers_spark.operators.gif import (
    GIF_SIGS,
    gif_decode,
    gif_encode,
    gif_header,
)
from no_fasel_scrapers_spark.operators.jpeg import (
    jpeg_decode,
    jpeg_encode,
    jpeg_header,
)

MAGIC = b"NFSI"  # fake-codec magic: NFSI | u16 w | u16 h | u8 channels | raw
PNG_SIG = b"\x89PNG\r\n\x1a\n"
JPEG_SIG = b"\xff\xd8"

META_SCHEMA = "width int, height int, channels int, n_bytes long, codec string"

# PNG color type ↔ channel count (8-bit depth only)
_PNG_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}   # gray, gray+A, RGB, RGBA
_PNG_CHANNELS = {v: k for k, v in _PNG_COLOR_TYPE.items()}


def fake_encode(width: int, height: int, channels: int, seed: int) -> bytes:
    """Deterministic fake image payload (tests/bench only)."""
    n = width * height * channels
    rng = np.arange(n, dtype=np.uint32) * np.uint32(2654435761) + np.uint32(seed)
    body = (rng >> 24).astype(np.uint8).tobytes()
    return MAGIC + struct.pack("<HHB", width, height, channels) + body


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    body = tag + data
    return struct.pack(">I", len(data)) + body + struct.pack(
        ">I", zlib.crc32(body)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """uint8 array (H,W) or (H,W,C) → spec-compliant 8-bit PNG bytes.

    Filter 0 on every scanline + one IDAT at zlib level 6 — deterministic,
    so fixtures and their pure-Python oracle twin produce identical files.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = _PNG_COLOR_TYPE[c]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def png_encode_palette(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """uint8 index array (H,W) + (N,3) palette → color-type-3 PNG bytes.

    Same deterministic recipe as ``png_encode`` (filter 0, one IDAT at
    zlib level 6) with a PLTE chunk between IHDR and IDAT."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("palette png needs (H,W) indices and (N,3) palette")
    if not 1 <= len(pal) <= 256:
        raise ValueError("palette must have 1..256 entries")
    if idx.max(initial=0) >= len(pal):
        raise ValueError("palette index out of range")
    h, w = idx.shape
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_chunks(payload: bytes) -> Iterator[tuple[bytes, bytes]]:
    pos = len(PNG_SIG)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        yield tag, data
        pos += 12 + length  # len + tag + data + crc
        if tag == b"IEND":
            break


def png_header(payload: bytes) -> dict | None:
    """Parse IHDR → (width, height, channels) or None if not a PNG this
    decoder supports (8-bit, non-interlaced, color types 0/2/3/4/6).
    Palette images (color type 3) report 3 channels — they decode to the
    palette-expanded RGB, same convention as the GIF codec."""
    if payload is None or not payload.startswith(PNG_SIG):
        return None
    for tag, data in _png_chunks(payload):
        if tag != b"IHDR" or len(data) != 13:
            return None
        w, h, depth, ctype, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", data
        )
        if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
            return None
        if ctype == 3:
            return {"width": w, "height": h, "channels": 3, "_ctype": 3}
        if ctype not in _PNG_CHANNELS:
            return None
        return {"width": w, "height": h,
                "channels": _PNG_CHANNELS[ctype], "_ctype": ctype}
    return None


def _unfilter_average(line: list, pv: list, c: int, stride: int) -> list:
    """Average unfilter, one scanline, in-place on ``line`` (a list of
    ints).  The x-recurrence (cur[i] needs cur[i-c]) is inherently
    sequential, so this is a tuned CPython loop, not numpy — see
    png_decode's perf note."""
    for i in range(c):
        line[i] = (line[i] + (pv[i] >> 1)) & 0xFF
    j = 0
    for li, b in zip(line[c:], pv[c:]):
        a = line[j]
        j += 1
        line[j + c - 1] = (li + ((a + b) >> 1)) & 0xFF
    return line


def _unfilter_paeth(line: list, pv: list, c: int, stride: int) -> list:
    """Paeth unfilter, one scanline, in-place on ``line``.

    Uses the libpng identity pa=|b-cc|, pb=|a-cc|, pc=|pa±pb| (same
    selections as the spec's |p-x| form) and a zip-driven loop: measured
    4.6× over the old per-byte numpy-scalar loop on a 512×512 RGB
    Paeth-filtered fixture (numpy scalar indexing + int() boxing was the
    cost, not the arithmetic).  Byte-identical output is pinned by
    tests/test_png_codec.py against hand-filtered scanlines."""
    for i in range(c):
        line[i] = (line[i] + pv[i]) & 0xFF
    j = 0
    for li, b, cc in zip(line[c:], pv[c:], pv):
        a = line[j]
        t1 = b - cc
        t2 = a - cc
        pa = t1 if t1 >= 0 else -t1
        pb = t2 if t2 >= 0 else -t2
        t3 = t1 + t2
        pc = t3 if t3 >= 0 else -t3
        j += 1
        line[j + c - 1] = (
            li + (a if pa <= pb and pa <= pc else b if pb <= pc else cc)
        ) & 0xFF
    return line


def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 pixel array (H,W,C), stdlib-only.

    Full unfiltering (types 0 None / 1 Sub / 2 Up / 3 Average / 4 Paeth).
    None/Sub/Up vectorize with numpy (copy/per-channel cumsum/add);
    Average and Paeth are sequential in x BY DEFINITION (cur[i] depends on
    the reconstructed cur[i-c]), so no exact numpy vectorization exists —
    they run as tuned CPython list loops (~4.6× the naive numpy-scalar
    loop; the remaining ceiling is the interpreter itself, which is where
    real clusters swap in libpng/PIL).  Distributed cost model is
    unchanged either way: decode is per-row work inside an Arrow batch.
    Raises ValueError on non-PNG or unsupported variants.
    """
    hdr = png_header(payload)
    if hdr is None:
        raise ValueError("not a supported PNG (8-bit non-interlaced)")
    w, h = hdr["width"], hdr["height"]
    # palette images carry ONE index byte per pixel through the filter
    # pipeline; expansion to RGB happens after unfiltering
    c = 1 if hdr["_ctype"] == 3 else hdr["channels"]
    idat = b"".join(d for t, d in _png_chunks(payload) if t == b"IDAT")
    raw = zlib.decompress(idat)
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    # prev row kept in BOTH shapes, converted lazily: numpy for the
    # vectorized filters, plain list for the sequential ones
    prev_arr = np.zeros(stride, dtype=np.uint8)
    prev_list: list | None = None
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        off = y * (stride + 1) + 1
        if ftype in (0, 1, 2):
            line = np.frombuffer(
                raw, dtype=np.uint8, count=stride, offset=off
            ).copy()
            if ftype == 0:
                cur = line
            elif ftype == 1:  # Sub: per-channel-offset cumulative sum
                cur = line.astype(np.uint32)
                for o in range(c):
                    cur[o::c] = np.cumsum(cur[o::c]) & 0xFF
                cur = cur.astype(np.uint8)
            else:  # Up
                cur = line + prev_arr
            out[y] = cur
            prev_arr = out[y]
            prev_list = None
        elif ftype in (3, 4):
            if prev_list is None:
                prev_list = prev_arr.tolist()
            line = list(raw[off:off + stride])
            unfilter = _unfilter_average if ftype == 3 else _unfilter_paeth
            cur_list = unfilter(line, prev_list, c, stride)
            out[y] = cur_list
            prev_arr = out[y]
            prev_list = cur_list
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    if hdr["_ctype"] == 3:
        plte = next(
            (d for t, d in _png_chunks(payload) if t == b"PLTE"), None
        )
        if plte is None or len(plte) % 3 or not 3 <= len(plte) <= 768:
            raise ValueError("PNG: missing or malformed PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = out.reshape(h, w)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("PNG: palette index out of range")
        # tRNS (palette alpha) is ignored — entries decode opaque RGB,
        # the same convention as the GIF codec's palette expansion
        return pal[idx]
    return out.reshape(h, w, c)


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real codec path: stdlib PNG + baseline/progressive JPEG + GIF decode
    in-sandbox; remaining formats (webp/avif/...) need PIL (absent in this
    container → NotImplementedError).  Arithmetic/extended JPEG raises
    from inside its decoder with its own honest message."""
    if payload is not None and payload.startswith(PNG_SIG):
        return png_decode(payload)
    if payload is not None and payload.startswith(JPEG_SIG):
        return jpeg_decode(payload)
    if payload is not None and payload[:6] in GIF_SIGS:
        return gif_decode(payload)
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "non-PNG/JPEG/GIF image decode needs PIL; PNG, JPEG and GIF "
            "decode via the stdlib paths, other formats use the fake "
            "codec (fake_encode) in this environment"
        ) from e
    raise NotImplementedError("real decode wiring lands with the codec libs")


def decode_header(payload: bytes) -> dict:
    png = png_header(payload) if payload is not None else None
    if png is not None:
        return {"width": png["width"], "height": png["height"],
                "channels": png["channels"], "n_bytes": len(payload),
                "codec": "png"}
    jpg = jpeg_header(payload) if payload is not None else None
    if jpg is not None:
        return {"width": jpg["width"], "height": jpg["height"],
                "channels": jpg["channels"], "n_bytes": len(payload),
                "codec": "jpeg"}
    gif = gif_header(payload) if payload is not None else None
    if gif is not None:
        return {**gif, "n_bytes": len(payload), "codec": "gif"}
    if payload is None or len(payload) < 9 or payload[:4] != MAGIC:
        return {"width": None, "height": None, "channels": None,
                "n_bytes": None if payload is None else len(payload),
                "codec": "unknown"}
    w, h, c = struct.unpack("<HHB", payload[4:9])
    return {"width": w, "height": h, "channels": c,
            "n_bytes": len(payload), "codec": "nfsi-fake"}


def _pixel_bytes(payload: bytes) -> np.ndarray | None:
    """Decoded pixel bytes for any supported codec, else None."""
    if payload is None:
        return None
    if payload.startswith(PNG_SIG):
        try:
            return png_decode(payload).ravel()
        except ValueError:
            return None
    if payload.startswith(JPEG_SIG):
        try:
            return jpeg_decode(payload).ravel()
        except (ValueError, NotImplementedError):
            # malformed or arithmetic/hierarchical stream: feature rows go
            # NULL rather than failing the batch (header-only metadata is
            # still available upstream via decode_header)
            return None
    if payload[:6] in GIF_SIGS:
        try:
            return gif_decode(payload).ravel()
        except (ValueError, NotImplementedError):
            # malformed stream: NULL, same contract as JPEG
            return None
    if len(payload) > 9 and payload[:4] == MAGIC:
        return np.frombuffer(payload, dtype=np.uint8, offset=9)
    return None


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
    """Pixel-histogram feature vector per payload (the 'embedding' stand-in).

    Shape of a real feature extractor: binary in → fixed-length
    array<float> out, numpy per batch.  PNG and baseline-JPEG payloads run
    the REAL stdlib decodes (the histogram is over decoded pixels,
    exercising the full inflate+unfilter / Huffman+IDCT paths);
    fake-codec payloads read their raw body."""
    cols = df.columns

    def _run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            feats = []
            for p in pdf[payload_col]:
                body = _pixel_bytes(p)
                if body is None:
                    feats.append(None)
                    continue
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
    """Nearest-neighbor resize, payload-rewriting UDF shape (binary in →
    binary out).  PNG in → PNG out, JPEG in → JPEG out (real decode —
    baseline SOF0 or progressive SOF2 since round 5 — then a baseline
    4:4:4 unit-quant re-encode, so the resize itself is the only loss)
    and GIF in → GIF out (lossless roundtrip: the resized frame's colors
    are a subset of the source palette, always re-encodable); fake codec
    in → fake codec out; anything else (malformed streams,
    arithmetic/hierarchical JPEG) → NULL."""
    cols = df.columns

    def _run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            resized = []
            for p in pdf[payload_col]:
                m = decode_header(p)
                if m["codec"] == "png":
                    body = png_decode(p)
                elif m["codec"] == "jpeg":
                    try:
                        body = jpeg_decode(p)
                    except (ValueError, NotImplementedError):
                        resized.append(None)
                        continue
                elif m["codec"] == "gif":
                    try:
                        body = gif_decode(p)
                    except (ValueError, NotImplementedError):
                        resized.append(None)
                        continue
                elif m["codec"] == "nfsi-fake":
                    body = np.frombuffer(p, dtype=np.uint8, offset=9).reshape(
                        m["height"], m["width"], m["channels"]
                    )
                else:
                    resized.append(None)
                    continue
                h, w, c = body.shape
                yi = (np.arange(height) * h // height)
                xi = (np.arange(width) * w // width)
                small = body[yi][:, xi]
                if m["codec"] == "png":
                    resized.append(png_encode(small))
                elif m["codec"] == "jpeg":
                    sq = small[:, :, 0] if small.shape[2] == 1 else small
                    resized.append(
                        jpeg_encode(sq, quant=1, subsampling="4:4:4")
                    )
                elif m["codec"] == "gif":
                    resized.append(gif_encode(small))
                else:
                    resized.append(
                        MAGIC
                        + struct.pack("<HHB", width, height, c)
                        + small.tobytes()
                    )
            out["resized"] = resized
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", resized binary"
    return df.mapInPandas(_run, schema=schema)


# Fake video container (tests/bench only — the video analog of MAGIC):
# NFSV | u16 w | u16 h | u8 channels | u16 n_frames | u8 fps | raw frames
VIDEO_MAGIC = b"NFSV"
_VIDEO_HDR = "<HHBHB"
_VIDEO_HDR_LEN = 4 + struct.calcsize(_VIDEO_HDR)


def fake_video_encode(
    width: int, height: int, channels: int, n_frames: int, seed: int,
    fps: int = 24,
) -> bytes:
    """Deterministic fake video payload; frame i's pixels reuse the
    fake-image PRNG with seed+i, so any frame is reconstructible."""
    frames = b"".join(
        fake_encode(width, height, channels, seed + i)[9:]  # raw body
        for i in range(n_frames)
    )
    return VIDEO_MAGIC + struct.pack(
        _VIDEO_HDR, width, height, channels, n_frames, fps
    ) + frames


def video_header(payload: bytes) -> dict | None:
    if payload is None or len(payload) < _VIDEO_HDR_LEN \
            or payload[:4] != VIDEO_MAGIC:
        return None
    w, h, c, n, fps = struct.unpack(
        _VIDEO_HDR, payload[4:_VIDEO_HDR_LEN]
    )
    return {"width": w, "height": h, "channels": c,
            "n_frames": n, "fps": fps}


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    stride: int = 2,
    max_frames: int | None = None,
    strict: bool = True,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (indices 0,
    stride, 2·stride, …, capped at ``max_frames``), each frame emitted
    as a REAL standalone PNG (the stdlib encoder) so downstream image
    operators (metadata/features/resize) consume it unchanged.

    This is the UDF shape of a real video pipeline — binary in →
    exploded typed rows out (pass-through columns + ``frame_idx`` +
    ``ts_ms`` from the container fps + ``frame`` binary), numpy per
    Arrow batch, zero shuffle.  Two containers decode for real: the
    NFSV fake codec and MJPEG-in-AVI (``operators/avi.py`` — RIFF walk
    + the stdlib JPEG codec; only the SAMPLED frames are ever
    entropy-decoded).  Inter-frame codecs (mp4/h264) need PyAV/ffmpeg,
    absent in this sandbox: with ``strict`` (default) such a payload
    raises (the honest seam, same convention as ``_decode_image_real``);
    ``strict=False`` skips those rows — and malformed/truncated AVIs
    with them — for pipelines that prefer dropping to failing.  NULL
    payloads yield no frames either way.
    """
    from no_fasel_scrapers_spark.operators.avi import (
        avi_frame_chunks,
        avi_header,
    )

    cols = df.columns

    def _run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in cols}
            rows.update(frame_idx=[], ts_ms=[], frame=[])
            # name-based access (not itertuples): pandas positionally
            # renames non-identifier/duplicate/keyword column names in
            # namedtuples, which would break getattr (ADVICE r3)
            for rec in zip(*(pdf[c] for c in cols)):
                rec = dict(zip(cols, rec))
                payload = rec[payload_col]
                if payload is None:
                    continue
                hdr = video_header(payload)
                if hdr is not None:
                    w, h, c = hdr["width"], hdr["height"], hdr["channels"]
                    frame_bytes = w * h * c
                    idxs = range(0, hdr["n_frames"], stride)
                    if max_frames is not None:
                        idxs = list(idxs)[:max_frames]

                    def _nfsv_frames():
                        for i in idxs:
                            start = _VIDEO_HDR_LEN + i * frame_bytes
                            yield i, np.frombuffer(
                                payload, dtype=np.uint8, count=frame_bytes,
                                offset=start,
                            ).reshape(h, w, c)

                    fps = hdr["fps"]
                    sampled = _nfsv_frames()
                else:
                    # the WHOLE avi path sits in the try: truncation can
                    # surface from the movi walk or a corrupt frame's
                    # JPEG decode, not just the header parse, and
                    # strict=False must skip those rows too
                    try:
                        ahdr = avi_header(payload)
                        if ahdr is None:
                            raise NotImplementedError(
                                "video containers beyond MJPEG-AVI and "
                                "NFSV need PyAV/ffmpeg (absent here); "
                                "pass strict=False to skip unknowns"
                            )
                        # ONE movi walk, sampling as it goes (movi is the
                        # frame-count truth — headers lie in the wild);
                        # only sampled frames are entropy-decoded, and
                        # the walk stops early once max_frames are in
                        sampled = []
                        for i, jpg in enumerate(
                            avi_frame_chunks(payload, ahdr)
                        ):
                            if i % stride:
                                continue
                            arr = jpeg_decode(jpg)
                            if arr.ndim == 2:
                                arr = arr[:, :, None]
                            sampled.append((i, arr))
                            if (max_frames is not None
                                    and len(sampled) >= max_frames):
                                break
                    except (ValueError, NotImplementedError):
                        if strict:
                            raise
                        continue
                    fps = ahdr["fps"]
                for i, arr in sampled:
                    for col in cols:
                        rows[col].append(rec[col])
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(int(i * 1000 / fps) if fps else 0)
                    rows["frame"].append(png_encode(arr))
            yield pd.DataFrame(rows, columns=cols + ["frame_idx", "ts_ms", "frame"])

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", frame_idx int, ts_ms long, frame binary"
    return df.mapInPandas(_run, schema=schema)
