"""Stdlib+numpy baseline JPEG codec (operators/jpeg.py): marker walk,
canonical Huffman, dequant + IDCT, chroma up/down-sampling, restart
markers, byte stuffing — no PIL/libjpeg anywhere.

The determinism contract the driver oracle leans on (jpeg.py module
docstring): a grayscale image whose 8×8 blocks are each constant has a
DC-only DCT with integer DC, so at unit quant encode→decode is BIT-EXACT.
Everything else round-trips within quantization error, pinned here with
explicit bounds.  Restart-marker decode is pinned against an entropy
stream assembled BY HAND from the spec's segment rules (the encoder never
emits DRI), mirroring test_png_codec's hand-filtered scanlines.
"""

import struct

import numpy as np
import pytest

from no_fasel_scrapers_spark.operators.jpeg import (
    _K3_AC_LUM,
    _K3_DC_LUM,
    _BitWriter,
    _encode_block,
    _huff_codes,
    jpeg_decode,
    jpeg_encode,
    jpeg_header,
)
from no_fasel_scrapers_spark.operators.multimodal import (
    _decode_image_real,
    decode_header,
    extract_features,
    resize_stub,
    with_media_metadata,
)


def _pixels(h, w, seed=7):
    rng = np.arange(h * w, dtype=np.uint32) * np.uint32(2654435761) + np.uint32(seed)
    return (rng >> 24).astype(np.uint8).reshape(h, w)


def _block_constant(bh, bw, seed=0):
    """Gray image whose 8×8 blocks are each a constant (hash of index)."""
    vals = (
        (np.arange(bh * bw, dtype=np.uint32) * np.uint32(2654435761)
         + np.uint32(seed)) >> 24
    ).astype(np.uint8)
    return np.kron(
        vals.reshape(bh, bw), np.ones((8, 8), dtype=np.uint8)
    ).astype(np.uint8)


@pytest.mark.parametrize("bh,bw", [(1, 2), (2, 3), (4, 4)])
def test_block_constant_gray_roundtrip_bit_exact(bh, bw):
    img = _block_constant(bh, bw, seed=bh * 31 + bw)
    payload = jpeg_encode(img, quant=1)
    hdr = jpeg_header(payload)
    assert (hdr["width"], hdr["height"], hdr["channels"]) == (bw * 8, bh * 8, 1)
    out = jpeg_decode(payload)
    assert out.shape == (bh * 8, bw * 8, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_non_multiple_of_8_crop_stays_bit_exact():
    # pad replication keeps edge blocks constant, so the cropped decode
    # is still exact
    img = _block_constant(2, 2, seed=5)[:13, :11]
    out = jpeg_decode(jpeg_encode(img, quant=1))
    assert out.shape == (13, 11, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_random_gray_unit_quant_error_bound():
    img = _pixels(64, 64, seed=3)
    payload = jpeg_encode(img, quant=1)
    # the deterministic fixture exercises 0xFF00 byte stuffing for real
    assert b"\xff\x00" in payload
    out = jpeg_decode(payload)[:, :, 0]
    assert int(np.max(np.abs(out.astype(int) - img.astype(int)))) <= 2


def test_rgb_444_roundtrip_error_bound():
    rgb = np.stack(
        [_pixels(24, 32, seed=s) for s in (1, 2, 3)], axis=-1
    )
    out = jpeg_decode(jpeg_encode(rgb, quant=1, subsampling="4:4:4"))
    assert out.shape == (24, 32, 3)
    # YCbCr forward/backward rounding only (no subsampling loss)
    assert int(np.max(np.abs(out.astype(int) - rgb.astype(int)))) <= 5


@pytest.mark.parametrize("sub", ["4:2:0", "4:2:2"])
def test_chroma_smooth_subsampled_roundtrip(sub):
    # constant color per 16×16 tile: chroma is flat inside every
    # subsampling window, so box down/up-sampling is lossless and only
    # color-transform rounding remains
    tiles = np.stack(
        [_pixels(2, 2, seed=s) for s in (11, 12, 13)], axis=-1
    )
    img = np.kron(
        tiles.transpose(2, 0, 1), np.ones((16, 16), np.uint8)
    ).transpose(1, 2, 0).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, quant=1, subsampling=sub))
    assert int(np.max(np.abs(out.astype(int) - img.astype(int)))) <= 2


def test_quant_table_lossy_but_bounded_on_smooth_input():
    g = np.tile((np.arange(64, dtype=np.uint16) * 4).astype(np.uint8), (32, 1))
    out = jpeg_decode(jpeg_encode(g, quant=16))[:, :, 0]
    assert int(np.max(np.abs(out.astype(int) - g.astype(int)))) <= 4


def test_header_parses_progressive_but_decode_raises():
    payload = bytearray(jpeg_encode(_block_constant(1, 1), quant=1))
    # patch SOF0 → SOF2 (progressive): header still reads dimensions,
    # full decode honestly refuses
    idx = payload.find(b"\xff\xc0")
    assert idx > 0
    payload[idx + 1] = 0xC2
    hdr = jpeg_header(bytes(payload))
    assert (hdr["width"], hdr["height"], hdr["sof"]) == (8, 8, 0xC2)
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg_decode(bytes(payload))


def test_header_rejects_non_jpeg():
    assert jpeg_header(b"notajpeg") is None
    assert jpeg_header(None) is None
    assert jpeg_header(b"\xff\xd8\xff") is None  # truncated
    with pytest.raises(ValueError):
        jpeg_decode(b"\xff\xd8\xff\xd9")  # SOI+EOI, no scan


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def test_restart_markers_hand_built_stream():
    """DRI=1 stream with an RST0 between the two MCUs, each entropy
    segment encoded independently (pred reset, pad-to-byte) per spec
    F.1.2.3 / E.1.3 — the encoder never writes DRI, so this pins the
    decoder's restart path against an independent construction."""
    img = _block_constant(1, 2, seed=9)  # 8×16 gray, two MCUs
    dc_t = _huff_codes(*_K3_DC_LUM)
    ac_t = _huff_codes(*_K3_AC_LUM)
    segments = []
    for bx in range(2):
        block = img[:, bx * 8:(bx + 1) * 8].astype(np.float64) - 128.0
        # DC-only block: quantized coefs = rint(orthonormal DCT)
        from no_fasel_scrapers_spark.operators.jpeg import _fdct
        coefs = np.rint(_fdct(block)).astype(np.int32)
        bw = _BitWriter()
        _encode_block(coefs, 0, dc_t, ac_t, bw)  # pred resets per segment
        bw.flush()
        segments.append(bytes(bw.out))
    entropy = segments[0] + b"\xff\xd0" + segments[1]

    out = bytearray(b"\xff\xd8")
    zz = bytes([1] * 64)
    out += _seg(0xDB, bytes([0x00]) + zz)
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(_K3_DC_LUM[0]) + bytes(_K3_DC_LUM[1]))
    out += _seg(0xC4, bytes([0x10]) + bytes(_K3_AC_LUM[0]) + bytes(_K3_AC_LUM[1]))
    out += _seg(0xDD, struct.pack(">H", 1))  # restart interval 1
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += entropy + b"\xff\xd9"

    dec = jpeg_decode(bytes(out))
    assert np.array_equal(dec[:, :, 0], img)


def test_decode_header_recognizes_jpeg():
    payload = jpeg_encode(_block_constant(1, 3, seed=2), quant=1)
    m = decode_header(payload)
    assert m["codec"] == "jpeg"
    assert (m["width"], m["height"], m["channels"]) == (24, 8, 1)
    assert m["n_bytes"] == len(payload)


def test_real_decode_entry_point_routes_jpeg():
    img = _block_constant(2, 2, seed=4)
    out = _decode_image_real(jpeg_encode(img, quant=1))
    assert np.array_equal(out[:, :, 0], img)


def test_media_pipeline_over_jpeg(spark):
    # 16×16 constant tiles: halving leaves 8×8 constant blocks, so the
    # resize→re-encode stays in the bit-exact DC-only regime
    img = np.kron(
        _block_constant(1, 2, seed=21)[::8, ::8],
        np.ones((16, 16), np.uint8),
    ).astype(np.uint8)  # 16×32
    df = spark.createDataFrame(
        [(0, bytes(jpeg_encode(img, quant=1)))],
        "media_id long, payload binary",
    )
    row = extract_features(with_media_metadata(df)).collect()[0]
    assert (row.codec, row.width, row.height, row.channels) == (
        "jpeg", 32, 16, 1,
    )
    hist, _ = np.histogram(img, bins=16, range=(0, 256))
    expect = (hist / hist.sum()).astype(np.float32)
    assert np.allclose(row.features, expect)

    out = resize_stub(df, width=16, height=8).collect()[0]
    m = decode_header(out.resized)
    assert m["codec"] == "jpeg"
    assert (m["width"], m["height"]) == (16, 8)
    yi, xi = np.arange(8) * 16 // 8, np.arange(16) * 32 // 16
    assert np.array_equal(
        jpeg_decode(out.resized)[:, :, 0], img[yi][:, xi]
    )


def test_progressive_features_null_not_fail(spark):
    payload = bytearray(jpeg_encode(_block_constant(1, 1), quant=1))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    df = spark.createDataFrame(
        [(0, bytes(payload))], "media_id long, payload binary"
    )
    rows = extract_features(with_media_metadata(df)).collect()
    assert rows[0].codec == "jpeg"      # header metadata still available
    assert rows[0].features is None    # decode honestly unavailable
    assert resize_stub(df).collect()[0].resized is None
