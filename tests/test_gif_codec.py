"""Stdlib GIF codec (operators/gif): LZW both directions, container parse,
extension skipping, honest interlace stub, and the multimodal wiring
(sniff, features, resize) — no PIL anywhere.

The decode side is pinned three independent ways: encoder roundtrips
(including streams long enough to force code-width growth to 12 bits and
table-full CLEAR resets), a HAND-PACKED code stream built by an
independent bit packer in this file, and the arithmetic pixel twin the
driver oracle uses (palette-expanded RGB equals the gray source repeated
across channels).
"""

import struct

import numpy as np
import pytest

from no_fasel_scrapers_spark.operators.gif import (
    GIF_SIGS,
    gif_decode,
    gif_encode,
    gif_header,
    lzw_decode,
    lzw_encode,
)
from no_fasel_scrapers_spark.operators.multimodal import (
    _decode_image_real,
    _pixel_bytes,
    decode_header,
    resize_stub,
)


def _gray(h, w, seed=7):
    rng = np.arange(h * w, dtype=np.uint32) * np.uint32(2654435761) + np.uint32(seed)
    return (rng >> 24).astype(np.uint8).reshape(h, w)


# ---------------------------------------------------------------------------
# LZW core
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mcs", [2, 3, 5, 8])
def test_lzw_roundtrip_sizes(mcs):
    import random

    rnd = random.Random(mcs)
    for n in (0, 1, 2, 7, 255, 256, 4096, 20000):
        data = bytes(rnd.randrange(1 << mcs) for _ in range(n))
        assert bytes(lzw_decode(lzw_encode(data, mcs), mcs)) == data


def test_lzw_roundtrip_forces_width_growth_and_reset():
    # high-entropy bytes at mcs=8 add ~1 table entry per emitted code, so
    # 30k inputs walk width 9->12 and trip the 4096 table-full CLEAR
    data = bytes(_gray(150, 200).ravel())
    stream = lzw_encode(data, 8)
    assert bytes(lzw_decode(stream, 8)) == data


def test_lzw_repetitive_input_compresses():
    data = b"\x01\x02\x03" * 5000
    stream = lzw_encode(data, 8)
    assert len(stream) < len(data) // 10
    assert bytes(lzw_decode(stream, 8)) == data


def _pack_lsb(codes_widths):
    """Independent LSB-first packer (different code path from _BitWriter)."""
    bits = []
    for code, width in codes_widths:
        bits.extend((code >> i) & 1 for i in range(width))
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        out[i // 8] |= b << (i % 8)
    return bytes(out)


def test_lzw_decode_hand_packed_stream():
    # mcs=2: clear=4, eoi=5.  Pixels [0,1,1,0]: the canonical hand trace
    # emits 0,1,1 at width 3 (table grows 6,7,8 -> width bumps to 4 when
    # the counter reaches 9) then 0 and EOI at width 4.
    stream = _pack_lsb([(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)])
    assert bytes(lzw_decode(stream, 2)) == bytes([0, 1, 1, 0])


def test_lzw_decode_kwkwk_case():
    # code == next-entry (the KwKwK construction): encoder emits 6 for
    # "00" immediately after defining it via the 0,0 prefix
    data = bytes([0, 0, 0, 0, 0])  # codes: 0, 6(="00"), 6... trace: 0,6,6
    stream = lzw_encode(data, 2)
    assert bytes(lzw_decode(stream, 2)) == data


def test_lzw_decode_rejects_future_code():
    stream = _pack_lsb([(4, 3), (0, 3), (7, 3), (5, 3)])  # 7 not yet defined
    with pytest.raises(ValueError, match="beyond table"):
        lzw_decode(stream, 2)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def test_roundtrip_gray_is_bit_exact_rgb_expansion():
    img = _gray(10, 7)
    payload = gif_encode(img)
    assert payload[:6] in GIF_SIGS
    out = gif_decode(payload)
    assert out.shape == (10, 7, 3)
    # palette is the identity gray ramp: every channel equals the source
    assert np.array_equal(out, np.repeat(img[:, :, None], 3, axis=2))


def test_roundtrip_rgb_palette():
    base = _gray(9, 13)
    img = np.stack([base, base // 2, 255 - base], axis=2)
    out = gif_decode(gif_encode(img))
    assert np.array_equal(out, img)


def test_roundtrip_large_forces_lzw_reset():
    img = _gray(150, 200)  # 30k pixels of high entropy
    out = gif_decode(gif_encode(img))
    assert np.array_equal(out[:, :, 0], img)


def test_roundtrip_constant_and_two_color():
    assert np.array_equal(
        gif_decode(gif_encode(np.full((31, 17), 200, np.uint8)))[:, :, 0],
        np.full((31, 17), 200, np.uint8),
    )
    img = (np.indices((5, 6)).sum(0) % 2 * 255).astype(np.uint8)
    assert np.array_equal(gif_decode(gif_encode(img))[:, :, 0], img)


def test_encode_rejects_over_256_colors():
    i = np.arange(32 * 32, dtype=np.uint32)  # 1024 distinct (r,g,0) colors
    img = np.stack([i >> 8, i & 0xFF, i * 0], axis=1).astype(np.uint8)
    img = img.reshape(32, 32, 3)
    with pytest.raises(ValueError, match="256 distinct colors"):
        gif_encode(img)


def test_header_parse_and_sniff_order():
    payload = gif_encode(_gray(4, 6))
    assert gif_header(payload) == {"width": 6, "height": 4, "channels": 3}
    assert gif_header(b"GIF8") is None
    assert gif_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20) is None


def test_decode_skips_extension_blocks():
    img = _gray(5, 5)
    payload = bytearray(gif_encode(img))
    # splice a Graphic Control Extension right before the image descriptor
    sep = 13 + 3 * 256  # header + LSD + the 256-entry gray-ramp GCT
    assert payload[sep] == 0x2C
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    spliced = bytes(payload[:sep]) + gce + bytes(payload[sep:])
    assert np.array_equal(gif_decode(spliced)[:, :, 0], img)


@pytest.mark.parametrize("h", [1, 2, 3, 4, 5, 8, 9, 16, 23])
def test_interlaced_roundtrip_every_pass_boundary(h):
    """Interlaced frames decode for real (round 5): the encoder stores
    rows in the four GIF89a passes and sets the flag; decode must invert
    the reorder exactly.  Heights 1-23 cover every pass-emptiness case
    (h<2: passes 2-4 empty; h<3: pass 3 partially empty, ...)."""
    img = _gray(h, 7)
    seq = gif_decode(gif_encode(img))
    inter = gif_decode(gif_encode(img, interlace=True))
    assert np.array_equal(inter, seq)
    assert np.array_equal(inter[:, :, 0], img)


def test_interlace_flag_set_and_rows_permuted_in_stream():
    """The interlaced payload differs from the sequential one exactly in
    the descriptor flag + row order — a decoder ignoring the flag would
    see a row permutation, so equality above is not vacuous."""
    img = _gray(9, 4)
    seq = gif_encode(img)
    inter = gif_encode(img, interlace=True)
    sep = 13 + 3 * 256
    assert seq[sep] == 0x2C and inter[sep] == 0x2C
    assert seq[sep + 9] == 0x00
    assert inter[sep + 9] == 0x40
    assert seq != inter
    from no_fasel_scrapers_spark.operators.gif import _interlace_rows

    order = _interlace_rows(9)
    assert sorted(order.tolist()) == list(range(9))
    assert order.tolist() == [0, 8, 4, 2, 6, 1, 3, 5, 7]


def test_decode_rejects_truncation_and_garbage():
    payload = gif_encode(_gray(6, 6))
    with pytest.raises(ValueError):
        gif_decode(payload[: len(payload) // 2])
    with pytest.raises(ValueError):
        gif_decode(b"not a gif at all")


def test_truncation_always_raises_value_error_never_struct_or_index():
    # the multimodal handlers catch (ValueError, NotImplementedError); a
    # struct.error or IndexError would crash the whole Arrow batch — cut
    # the payload at EVERY offset and demand the contract holds
    payload = gif_encode(_gray(10, 10))
    for cut in range(len(payload)):
        try:
            gif_decode(payload[:cut])
        except (ValueError, NotImplementedError):
            pass
        # any other exception type propagates and fails the test


def test_frame_rect_composites_onto_logical_screen():
    # hand-shrink the frame: re-point the descriptor at a 2x3 rect at
    # (1, 2) inside the 6x6 screen and re-encode a matching LZW stream
    img = _gray(3, 2, seed=5)  # 3 rows x 2 cols
    full = gif_encode(np.zeros((6, 6), np.uint8))
    sep = 13 + 3 * 256
    assert full[sep] == 0x2C
    desc = struct.pack("<HHHH", 1, 2, 2, 3) + b"\x00"  # left,top,w,h,flags
    from no_fasel_scrapers_spark.operators.gif import _blocks, lzw_encode

    body = bytes([8]) + _blocks(lzw_encode(img.ravel().tobytes(), 8))
    payload = full[:sep] + bytes([0x2C]) + desc + body + bytes([0x3B])
    out = gif_decode(payload)
    assert out.shape == (6, 6, 3)  # logical screen, not frame rect
    assert np.array_equal(out[2:5, 1:3, 0], img)
    # background fill = GCT[background index] = gray 0
    mask = np.ones((6, 6), bool)
    mask[2:5, 1:3] = False
    assert (out[mask] == 0).all()


def test_frame_rect_exceeding_screen_raises():
    full = gif_encode(np.zeros((4, 4), np.uint8))
    sep = 13 + 3 * 256
    desc = struct.pack("<HHHH", 2, 2, 4, 4) + b"\x00"  # overflows 4x4
    from no_fasel_scrapers_spark.operators.gif import _blocks, lzw_encode

    body = bytes([8]) + _blocks(lzw_encode(bytes(16), 8))
    payload = full[:sep] + bytes([0x2C]) + desc + body + bytes([0x3B])
    with pytest.raises(ValueError, match="exceeds"):
        gif_decode(payload)


# ---------------------------------------------------------------------------
# multimodal wiring
# ---------------------------------------------------------------------------

def test_decode_header_recognizes_gif():
    payload = gif_encode(_gray(8, 16))
    meta = decode_header(payload)
    assert meta == {
        "width": 16, "height": 8, "channels": 3,
        "n_bytes": len(payload), "codec": "gif",
    }


def test_real_decode_and_pixel_bytes():
    img = _gray(8, 16)
    payload = gif_encode(img)
    assert np.array_equal(_decode_image_real(payload)[:, :, 0], img)
    body = _pixel_bytes(payload)
    assert np.array_equal(body, np.repeat(img.ravel(), 3))
    # flipping the interlace flag on a sequentially-stored stream decodes
    # (interlace is a row reorder, round 5): rows land de-interleaved
    from no_fasel_scrapers_spark.operators.gif import _interlace_rows

    flipped = bytearray(payload)
    flipped[13 + 3 * 256 + 9] |= 0x40
    got = _pixel_bytes(bytes(flipped)).reshape(8, 16, 3)[:, :, 0]
    want = np.empty_like(img)
    want[_interlace_rows(8)] = img
    assert np.array_equal(got, want)
    # genuinely malformed payloads still degrade to NULL features
    assert _pixel_bytes(payload[: len(payload) // 2]) is None


def test_resize_gif_payload(spark):
    img = _gray(32, 32)
    rows = [(1, bytearray(gif_encode(img)))]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = resize_stub(df, width=8, height=8).collect()[0]
    resized = gif_decode(bytes(out.resized))
    assert resized.shape == (8, 8, 3)
    # nearest-neighbor: resized pixels are drawn from the source image
    yi = np.arange(8) * 32 // 8
    assert np.array_equal(resized[:, :, 0], img[yi][:, yi])
