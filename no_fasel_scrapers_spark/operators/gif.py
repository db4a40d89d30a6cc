"""Stdlib-only GIF codec (encoder + decoder) — LZW over palette indices.

Completes the web-image trio: PNG landed in round 3, JPEG in rounds 4-5
(baseline + progressive), and GIF is the third classic bitmap format a
crawl's image pipeline meets (``Common.py:233-246`` fetches whatever the
poster URL serves).  Same playbook as ``operators/jpeg.py``: a real
spec-level implementation (CompuServe GIF89a, public specification) with
no codec libraries, wired into the multimodal operators' sniff /
feature / resize paths.

Implemented:

- header (GIF87a/GIF89a), logical screen descriptor, global and local
  color tables (power-of-two padded, size field per spec)
- extension blocks (graphic control / comment / application) parsed and
  skipped via their sub-block chains
- image descriptor + LZW variable-width decode: LSB-first bit packing
  across 255-byte sub-blocks, CLEAR/EOI codes, code width growth to the
  12-bit cap, full-table (4096) handling
- a real LZW *encoder* (dictionary build over (prefix_code, byte) pairs,
  code-width growth mirroring the decoder's counter exactly, explicit
  non-deferred CLEAR when the table fills)
- palette construction: grayscale input uses the identity 256-gray ramp
  (index == gray value); RGB input builds a sorted unique-color palette
  and raises ``ValueError`` past 256 distinct colors (GIF's hard limit)

Interlaced frames decode for real (round 5): the four-pass GIF89a row
order is a pure reorder applied after LZW (``_interlace_rows``), and the
encoder can write interlaced fixtures so the round trip pins the inverse
exactly.  Honestly NOT implemented: animation (only the FIRST frame
decodes — multi-frame iteration belongs to the video family's
``sample_frames``).

Determinism contract (what the driver oracle pins): LZW is lossless, so
``gif_decode(gif_encode(img))`` is BIT-EXACT palette-expanded RGB for any
``<=256``-color input — the oracle's arithmetic pixel twin
(``oracle/analytic.py``) predicts decoded pixels without running this
code, while the engine side must walk the real descriptor / sub-block /
LZW / palette path to land on them.

Scale note: LZW runs as a per-payload CPython loop inside Arrow batches
(same cost model as the PNG unfilter / JPEG Huffman paths — real
clusters swap in PIL/libgif); the distributed shape (mapInPandas over a
binary column, metadata struct for pruning) is what this repo owns.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")
_TRAILER = 0x3B
_EXTENSION = 0x21
_IMAGE_SEP = 0x2C
_MAX_CODE = 4096  # 12-bit cap, per spec


# ---------------------------------------------------------------------------
# LZW core
# ---------------------------------------------------------------------------

class _BitWriter:
    """LSB-first bit packer (GIF packs code streams little-endian)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def flush(self) -> bytes:
        if self._nbits:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._nbits = 0
        return bytes(self.out)


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW compress ``data`` (palette indices) → code stream.

    Width bookkeeping mirrors the decoder's lagging table counter: the
    decoder adds its entry one code *behind* the encoder, so the encoder
    grows its emit width when ``next_code == (1 << width) + 1`` — the
    point at which the decoder's own counter has just reached
    ``1 << width``.  When the table fills (4096), the current prefix is
    flushed and an explicit CLEAR resets both sides in lockstep (no
    deferred-clear mode)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()
    width = min_code_size + 1
    bw.write(clear, width)
    if not data:
        bw.write(eoi, width)
        return bw.flush()
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    prev = data[0]
    for k in data[1:]:
        key = (prev, k)
        code = table.get(key)
        if code is not None:
            prev = code
            continue
        bw.write(prev, width)
        if next_code < _MAX_CODE:
            table[key] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            bw.write(clear, width)
            table.clear()
            width = min_code_size + 1
            next_code = eoi + 1
        prev = k
    bw.write(prev, width)
    bw.write(eoi, width)
    return bw.flush()


def lzw_decode(stream: bytes, min_code_size: int) -> bytearray:
    """GIF-flavor LZW decompress a (de-blocked) code stream → indices."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    singles = [bytes([i]) for i in range(clear)]
    table: list[bytes] = []
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    n = len(stream)
    prev: bytes | None = None

    def _reset() -> None:
        nonlocal table, width, prev
        table = list(singles) + [b"", b""]  # clear/eoi placeholders
        width = min_code_size + 1
        prev = None

    _reset()
    while True:
        while nbits < width:
            if pos >= n:
                # stream ended without EOI — tolerated like most readers,
                # everything decoded so far is returned
                return out
            acc |= stream[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            _reset()
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError(f"LZW: first code {code} not in table")
            entry = table[code]
            out += entry
            prev = entry
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError(
                    f"LZW: code {code} beyond table size {len(table)}"
                )
            out += entry
            if len(table) < _MAX_CODE:
                table.append(prev + entry[:1])
            prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def _blocks(data: bytes) -> bytes:
    """Pack ``data`` into GIF sub-blocks (<=255 bytes + length prefix)."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at ``pos``; return (data,
    position after the 0-length terminator)."""
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("GIF: truncated sub-block chain")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        out += payload[pos : pos + ln]
        if pos + ln > len(payload):
            raise ValueError("GIF: truncated sub-block data")
        pos += ln


_GRAY_RAMP = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)


def _build_palette(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette (n,3) uint8, index image (h,w) uint8) for ``arr``.

    Grayscale input maps through the identity 256-gray ramp (index ==
    gray value — deterministic, no per-image palette ordering); RGB
    input builds a lexicographically sorted unique-color palette."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError(f"GIF encode wants (h,w[,1|3]) uint8, got {arr.shape}")
    if arr.dtype != np.uint8:
        raise ValueError(f"GIF encode wants uint8 pixels, got {arr.dtype}")
    if arr.shape[2] == 1:
        return _GRAY_RAMP, arr[:, :, 0]
    h, w, _ = arr.shape
    packed = (
        arr[:, :, 0].astype(np.uint32) << 16
    ) | (arr[:, :, 1].astype(np.uint32) << 8) | arr[:, :, 2].astype(np.uint32)
    colors = np.unique(packed)
    if len(colors) > 256:
        raise ValueError(
            f"GIF is limited to 256 distinct colors, image has {len(colors)}"
        )
    palette = np.stack(
        [(colors >> 16) & 0xFF, (colors >> 8) & 0xFF, colors & 0xFF], axis=1
    ).astype(np.uint8)
    idx = np.searchsorted(colors, packed.ravel()).astype(np.uint8)
    return palette, idx.reshape(h, w)


def _interlace_rows(h: int) -> np.ndarray:
    """Display-row order of the four GIF89a interlace passes: stored row
    k of an interlaced frame belongs at display row result[k]."""
    return np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])


def gif_encode(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Encode (h,w) / (h,w,1) grayscale or (h,w,3) RGB uint8 → GIF89a.

    ``interlace=True`` stores the rows in the four-pass GIF89a order and
    sets the descriptor flag — the decode twin must invert the reorder
    exactly for the round trip to stay bit-exact."""
    palette, idx = _build_palette(np.asarray(arr))
    h, w = idx.shape
    if not (0 < w <= 0xFFFF and 0 < h <= 0xFFFF):
        raise ValueError(f"GIF dimensions out of range: {w}x{h}")
    # global color table: power-of-two padded, >=2 entries
    size_bits = max(1, int(len(palette) - 1).bit_length())
    gct = np.zeros((1 << size_bits, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    mcs = max(2, size_bits)  # spec: LZW min code size >= 2
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (7 << 4) | (size_bits - 1))  # GCT flag, 8-bit res
    out += b"\x00\x00"  # background index, aspect ratio
    out += gct.tobytes()
    out.append(_IMAGE_SEP)
    out += struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlace else 0)  # no local table
    out.append(mcs)
    if interlace:
        idx = idx[_interlace_rows(h)]
    out += _blocks(lzw_encode(idx.tobytes(), mcs))
    out.append(_TRAILER)
    return bytes(out)


def gif_header(payload: bytes) -> dict | None:
    """Parse width/height from the logical screen descriptor; None if not
    a GIF.  ``channels`` is always 3 — GIF is palette-indexed RGB."""
    if payload is None or len(payload) < 13 or payload[:6] not in GIF_SIGS:
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    return {"width": w, "height": h, "channels": 3}


def _need(payload: bytes, pos: int, n: int, what: str) -> None:
    """Bounds guard: every fixed-width read raises ValueError on
    truncation — the multimodal handlers' 'malformed stream → NULL row'
    contract catches (ValueError, NotImplementedError), never
    struct.error/IndexError."""
    if pos + n > len(payload):
        raise ValueError(f"GIF: truncated at {what} (offset {pos})")


def gif_decode(payload: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF → (screen_h, screen_w, 3) uint8 RGB.

    The frame rect is composited at its (left, top) offset onto a
    background-color canvas of the LOGICAL SCREEN size, so the output
    shape always agrees with ``gif_header``'s dimensions even for the
    common frame-smaller-than-screen optimization.  Extensions are
    skipped; interlaced frames de-interlace via the four-pass row
    reorder; animation beyond frame 0 is ignored by design
    (``sample_frames`` owns frame iteration for the video family)."""
    hdr = gif_header(payload)
    if hdr is None:
        raise ValueError("not a GIF payload")
    sw, sh = hdr["width"], hdr["height"]
    pos = 10
    flags = payload[pos]
    bg_index = payload[pos + 1]
    pos += 3  # flags, background index, aspect ratio
    gct: np.ndarray | None = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        _need(payload, pos, 3 * n, "global color table")
        gct = np.frombuffer(
            payload[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            _need(payload, pos, 1, "extension label")
            pos += 1
            _, pos = _read_blocks(payload, pos)
            continue
        if block != _IMAGE_SEP:
            raise ValueError(f"GIF: unknown block 0x{block:02x} at {pos - 1}")
        _need(payload, pos, 9, "image descriptor")
        left, top, w, h = struct.unpack("<HHHH", payload[pos : pos + 8])
        iflags = payload[pos + 8]
        pos += 9
        palette = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            _need(payload, pos, 3 * n, "local color table")
            palette = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF: frame has no color table")
        if left + w > sw or top + h > sh:
            raise ValueError(
                f"GIF: frame rect {w}x{h}@({left},{top}) exceeds the "
                f"{sw}x{sh} logical screen"
            )
        _need(payload, pos, 1, "LZW min code size")
        mcs = payload[pos]
        pos += 1
        stream, pos = _read_blocks(payload, pos)
        idx = np.frombuffer(lzw_decode(stream, mcs), dtype=np.uint8)
        if len(idx) != w * h:
            raise ValueError(
                f"GIF: LZW produced {len(idx)} indices for {w}x{h} frame"
            )
        if idx.max(initial=0) >= len(palette):
            raise ValueError("GIF: palette index out of range")
        bg = (
            gct[bg_index]  # background index refers to the GLOBAL table
            if gct is not None and bg_index < len(gct)
            else np.zeros(3, dtype=np.uint8)
        )
        rect = palette[idx].reshape(h, w, 3)
        if iflags & 0x40:
            # interlaced frame: rows arrive in the four GIF89a passes
            # (0,8,16,… then 4,12,… then 2,6,… then 1,3,…) — stored row k
            # is display row _interlace_rows(h)[k], a pure reorder
            de = np.empty_like(rect)
            de[_interlace_rows(h)] = rect
            rect = de
        out = np.broadcast_to(bg, (sh, sw, 3)).copy()
        out[top : top + h, left : left + w] = rect
        return out
    raise ValueError("GIF: no image descriptor before trailer")
