"""AVI (RIFF) MJPEG container: the video modality decoded for real.

Completes the multimodal family next to the image codecs (PNG/JPEG/GIF,
``operators/multimodal.py``) and audio (``operators/wav.py``): a video
payload rides as one opaque ``binary`` column holding a real AVI RIFF
container whose ``00dc`` chunks are baseline JPEG frames, and both
directions run stdlib+numpy-only — the container walk is pure ``struct``
(the same RIFF chunk machinery as WAV: little-endian sizes, word
alignment, LIST recursion) and per-frame pixels come from
``operators/jpeg.jpeg_decode``.  MJPEG-in-AVI is exactly the container a
scanner meets as legacy webcam/surveillance output, and it is the one
real video format this sandbox can do end-to-end without PyAV/ffmpeg.

Format scope (honest seams, same contract as the image/audio codecs):

- ``MJPG`` video streams (fccHandler or biCompression) — decoded for
  real, every frame a standalone baseline JPEG.
- Any other stream codec (h264, vp9, ...) raises ``NotImplementedError``
  — inter-frame codecs genuinely need PyAV/ffmpeg; real clusters bring
  them.  The CONTAINER parse is still real for those files (dimensions,
  frame count, fps all come back from ``avi_header`` before the raise,
  which is how a 100-TB triage pass would route them).
- Not-a-RIFF-AVI payload → ``None`` from ``avi_header`` (the caller's
  "unknown codec" row); a RIFF payload whose declared sizes run past
  the buffer → ``ValueError`` (truncation is corruption, not a
  different format — pinned by the cut-at-every-offset test, the same
  contract ``gif_decode`` and ``wav_header`` established).

Structure handled: ``LIST hdrl`` (``avih`` MainAVIHeader + ``LIST strl``
per stream: ``strh`` AVIStreamHeader + ``strf`` BITMAPINFOHEADER),
``LIST movi`` (``00dc``/``00db`` frame chunks, ``LIST rec `` groupings
recursed), ``idx1`` written on encode and ignored on decode (movi is
walked directly — indexes lie in the wild), non-video streams skipped,
trailing bytes past the declared RIFF size ignored.

At 100 TB the image rules apply unchanged: ``avi_header`` reads only
headers so planners prune on the metadata struct without touching frame
bytes, and frame DECODE happens per-row inside Arrow batches
(``multimodal.sample_frames``) — only the sampled frames are ever
entropy-decoded.
"""

from __future__ import annotations

import struct
from typing import Iterator, Sequence

import numpy as np

from no_fasel_scrapers_spark.operators.jpeg import jpeg_decode, jpeg_encode
from no_fasel_scrapers_spark.operators.wav import riff_chunks

AVI_RIFF = b"RIFF"
AVI_MAGIC = b"AVI "

AVIIF_KEYFRAME = 0x10
AVIF_HASINDEX = 0x10

_AVIH = "<14I"           # MainAVIHeader: 14 DWORDs
_STRH = "<4s4sIHHIIIIIIII4h"   # AVIStreamHeader incl. rcFrame
_STRF_BMP = "<IiiHH4sIiiII"    # BITMAPINFOHEADER


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(listtype: bytes, body: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", 4 + len(body)) + listtype + body


def avi_encode(
    frames: Sequence[np.ndarray],
    fps: int = 24,
    quant: np.ndarray | int = 1,
    subsampling: str = "4:4:4",
) -> bytes:
    """uint8 frames (each (H,W) gray or (H,W,3) RGB, all same shape) →
    spec-compliant MJPEG AVI bytes.

    Each frame goes through ``jpeg_encode`` (so the stored chunk bytes
    ARE the codec twin's output — fixtures and oracles agree
    byte-for-byte) and the container carries a correct ``idx1`` index
    even though our own decoder never trusts one."""
    if not frames:
        raise ValueError("avi: need at least one frame")
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = arrs[0].shape[:2]
    ch = arrs[0].shape[2] if arrs[0].ndim == 3 else 1
    for a in arrs:
        a_ch = a.shape[2] if a.ndim == 3 else 1
        if a.shape[:2] != (h, w) or a_ch != ch:
            raise ValueError("avi: all frames must share one shape")
    if fps <= 0:
        raise ValueError("avi: fps must be positive")
    jpegs = [jpeg_encode(a, quant=quant, subsampling=subsampling)
             for a in arrs]
    buf_size = max(len(j) for j in jpegs)

    avih = struct.pack(
        _AVIH,
        1_000_000 // fps,        # dwMicroSecPerFrame
        buf_size * fps,          # dwMaxBytesPerSec (upper bound)
        0,                       # dwPaddingGranularity
        AVIF_HASINDEX,           # dwFlags
        len(jpegs),              # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        buf_size,                # dwSuggestedBufferSize
        w, h,
        0, 0, 0, 0,              # dwReserved[4]
    )
    strh = struct.pack(
        _STRH,
        b"vids", b"MJPG",
        0,                       # dwFlags
        0, 0,                    # wPriority, wLanguage
        0,                       # dwInitialFrames
        1, fps,                  # dwScale, dwRate → fps
        0,                       # dwStart
        len(jpegs),              # dwLength (frames)
        buf_size,                # dwSuggestedBufferSize
        0,                       # dwQuality (codec default)
        0,                       # dwSampleSize (0 = variable)
        0, 0, w, h,              # rcFrame
    )
    strf = struct.pack(
        _STRF_BMP,
        40, w, h, 1,
        24 if ch == 3 else 8,    # biBitCount
        b"MJPG",
        w * h * ch,              # biSizeImage (uncompressed bound)
        0, 0, 0, 0,
    )
    movi = bytearray()
    idx = bytearray()
    off = 4  # idx1 offsets count from the 'movi' fourcc
    for j in jpegs:
        c = _chunk(b"00dc", j)
        idx += struct.pack("<4sIII", b"00dc", AVIIF_KEYFRAME, off, len(j))
        off += len(c)
        movi += c
    body = (
        _list(
            b"hdrl",
            _chunk(b"avih", avih)
            + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
        )
        + _list(b"movi", bytes(movi))
        + _chunk(b"idx1", bytes(idx))
    )
    return AVI_RIFF + struct.pack("<I", 4 + len(body)) + AVI_MAGIC + body


def _chunks(payload: bytes, pos: int, end: int) -> Iterator[
    tuple[bytes, int, int]
]:
    """The shared RIFF walk (operators/wav.riff_chunks) with this codec's
    error prefix — one invariant, two codecs."""
    return riff_chunks(payload, pos, end, who="avi")


def avi_header(payload: bytes) -> dict | None:
    """Parse RIFF/hdrl headers → metadata dict, or None if the payload is
    not an AVI at all.  Locates (but does not walk) the movi list; frame
    bytes are never touched.

    Raises ``ValueError`` on truncation/garbage inside a real AVI and
    ``NotImplementedError`` for a non-MJPEG video stream — with the
    container facts already parsed into the exception message so a triage
    pass can still log what it skipped."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] != AVI_RIFF or payload[8:12] != AVI_MAGIC:
        return None
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = 8 + riff_size
    if end > len(payload):
        raise ValueError("avi: truncated RIFF body")
    avih = None
    vids = None   # (fccHandler, dwScale, dwRate, dwLength)
    vid_stream = None  # strl order position = the stream number in ckids
    bmp = None    # (biBitCount, biCompression)
    movi = None
    n_streams = 0
    for tag, off, size in _chunks(payload, 12, end):
        if tag != b"LIST":
            continue  # idx1 / JUNK / unknown top-level chunks
        listtype = payload[off:off + 4]
        if listtype == b"movi":
            if movi is None:
                movi = (off + 4, size - 4)
        elif listtype == b"hdrl":
            for t2, o2, s2 in _chunks(payload, off + 4, off + size):
                if t2 == b"avih":
                    if s2 < struct.calcsize(_AVIH):
                        raise ValueError("avi: avih chunk too short")
                    avih = struct.unpack_from(_AVIH, payload, o2)
                elif t2 == b"LIST" and payload[o2:o2 + 4] == b"strl":
                    sidx = n_streams
                    n_streams += 1
                    in_vids = False
                    for t3, o3, s3 in _chunks(payload, o2 + 4, o2 + s2):
                        if t3 == b"strh":
                            if s3 < struct.calcsize(_STRH):
                                raise ValueError("avi: strh too short")
                            sh = struct.unpack_from(_STRH, payload, o3)
                            in_vids = sh[0] == b"vids" and vids is None
                            if in_vids:
                                vids = (sh[1], sh[6], sh[7], sh[9])
                                vid_stream = sidx
                        elif t3 == b"strf" and in_vids:
                            if s3 < struct.calcsize(_STRF_BMP):
                                raise ValueError("avi: strf too short")
                            sf = struct.unpack_from(_STRF_BMP, payload, o3)
                            bmp = (sf[4], sf[5])
    if avih is None or movi is None:
        raise ValueError("avi: missing hdrl/movi list")
    if vids is None:
        raise ValueError("avi: no video stream")
    handler, scale, rate, length = vids
    compression = bmp[1] if bmp else b"\x00" * 4
    if handler.upper() != b"MJPG" and compression.upper() != b"MJPG":
        fourcc = (compression if compression.strip(b"\x00") else handler)
        raise NotImplementedError(
            f"avi: stream codec {fourcc!r} needs PyAV/ffmpeg (absent "
            f"here); container parsed ok: {avih[8]}x{avih[9]}, "
            f"{length or avih[4]} frames"
        )
    fps = (rate / scale) if scale else (
        1_000_000 / avih[0] if avih[0] else 0.0
    )
    return {
        "codec": "mjpeg",
        "width": avih[8],
        "height": avih[9],
        "channels": 3 if (bmp and bmp[0] == 24) else 1,
        "n_frames": length or avih[4],
        "fps": fps,
        "_movi_off": movi[0],
        "_movi_size": movi[1],
        "_stream": vid_stream,
    }


def _movi_frames(
    payload: bytes, pos: int, end: int, want: bytes
) -> Iterator[bytes]:
    for tag, off, size in _chunks(payload, pos, end):
        if tag == b"LIST" and payload[off:off + 4] == b"rec ":
            yield from _movi_frames(payload, off + 4, off + size, want)
        elif tag[:2] == want and tag[2:4] in (b"dc", b"db"):
            yield payload[off:off + size]


def avi_frame_chunks(payload: bytes, meta: dict | None = None) -> Iterator[
    bytes
]:
    """Yield the SELECTED video stream's frame JPEG bytes in stream order
    by walking the movi list (``NNdc`` compressed / ``NNdb``
    uncompressed-tagged chunks where NN is the stream number
    ``avi_header`` picked — a second video or audio stream's chunks are
    skipped, not interleaved; ``LIST rec `` groupings recursed; idx1
    deliberately ignored).  Pass an ``avi_header`` result as ``meta`` to
    skip re-walking the headers."""
    if meta is None:
        meta = avi_header(payload)
    if meta is None:
        raise ValueError("avi: not a RIFF/AVI payload")
    off, size = meta["_movi_off"], meta["_movi_size"]
    want = b"%02d" % meta["_stream"]
    yield from _movi_frames(payload, off, off + size, want)


def avi_decode_frames(
    payload: bytes,
    indices: Sequence[int] | None = None,
    meta: dict | None = None,
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (frame_idx, uint8 (H,W,C) pixels) for the requested frame
    indices (all frames when None).  Only requested frames are
    entropy-decoded — the walk itself never touches frame bytes, which is
    what keeps strided sampling cheap on long clips."""
    want = None if indices is None else set(indices)
    for i, jpg in enumerate(avi_frame_chunks(payload, meta)):
        if want is not None and i not in want:
            continue
        arr = jpeg_decode(jpg)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        yield i, arr
