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
    jpeg_encode_progressive,
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


def test_malformed_progressive_scan_raises():
    """A baseline stream with only its SOF marker patched to SOF2 is NOT a
    valid progressive stream: its single scan declares Ss=0, Se=63, which
    Annex G forbids (a DC scan must have Se=0).  The decoder (which now
    implements real progressive decode) must reject it as malformed rather
    than misread it; the header still reads dimensions."""
    payload = bytearray(jpeg_encode(_block_constant(1, 1), quant=1))
    idx = payload.find(b"\xff\xc0")
    assert idx > 0
    payload[idx + 1] = 0xC2
    hdr = jpeg_header(bytes(payload))
    assert (hdr["width"], hdr["height"], hdr["sof"]) == (8, 8, 0xC2)
    with pytest.raises(ValueError, match="Se=0"):
        jpeg_decode(bytes(payload))


def test_malformed_progressive_raises_valueerror_not_indexerror():
    """Any malformed real-web stream must surface as ValueError — the type
    multimodal's NULL-row guard catches — never a raw IndexError/KeyError
    from the parser internals, which would kill the whole mapInPandas task
    (round-5 review find; both repros escaped the guard before the
    jpeg_decode boundary wrapper)."""
    img = _block_constant(1, 2, seed=3)
    good = bytes(jpeg_encode_progressive(img, quant=1))
    idx = good.find(b"\xff\xda")
    assert idx > 0

    # (a) SOS length field truncates the Ss/Se/AhAl parameter bytes:
    # seg keeps only [ns, cs, tdta], so seg[1+2*ns] used to IndexError.
    trunc = bytearray(good)
    struct.pack_into(">H", trunc, idx + 2, 5)
    with pytest.raises(ValueError, match="malformed JPEG"):
        jpeg_decode(bytes(trunc))

    # (b) scan references a Huffman table id never declared by any DHT:
    # htabs[(0, 3)] used to KeyError.
    badtab = bytearray(good)
    badtab[idx + 6] = 0x33  # first scan component's Td/Ta -> table 3/3
    with pytest.raises(ValueError, match="malformed JPEG"):
        jpeg_decode(bytes(badtab))


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


def test_malformed_progressive_features_null_not_fail(spark):
    """An INVALID progressive stream (baseline scan under a SOF2 marker)
    must produce NULL feature rows, not fail the batch — header-only
    metadata stays available."""
    payload = bytearray(jpeg_encode(_block_constant(1, 1), quant=1))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    df = spark.createDataFrame(
        [(0, bytes(payload))], "media_id long, payload binary"
    )
    rows = extract_features(with_media_metadata(df)).collect()
    assert rows[0].codec == "jpeg"      # header metadata still available
    assert rows[0].features is None    # malformed stream: NULL, no crash
    assert resize_stub(df).collect()[0].resized is None


# ---------------------------------------------------------------------------
# progressive (SOF2) — VERDICT r4 #3
# ---------------------------------------------------------------------------

def test_progressive_decode_identical_to_baseline():
    """The progressive scan script reconstructs the exact baseline
    coefficients, so decode output must be pixel-IDENTICAL to the baseline
    stream's — across shapes, subsamplings, quant and Al chains (DC
    first/refine, AC first with EOB runs, AC refinement)."""
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (19, 35), dtype=np.uint8)
    rgb = rng.integers(0, 256, (21, 37, 3), dtype=np.uint8)
    cases = [(gray, "4:4:4")] + [
        (rgb, sub) for sub in ("4:4:4", "4:2:2", "4:2:0")
    ]
    for img, sub in cases:
        for q in (1, 16):
            base = jpeg_decode(jpeg_encode(img, quant=q, subsampling=sub))
            for dc_al, ac_al in ((0, 0), (1, 1), (2, 2), (1, 2), (3, 1)):
                prog = jpeg_decode(
                    jpeg_encode_progressive(
                        img, quant=q, subsampling=sub,
                        dc_al=dc_al, ac_al=ac_al,
                    )
                )
                assert np.array_equal(base, prog), (
                    img.shape, sub, q, dc_al, ac_al,
                )


def test_progressive_block_constant_bit_exact():
    """Same bit-exact contract as baseline: DC-only blocks + unit quant
    round-trip exactly through the multi-scan path."""
    img = _block_constant(2, 3, seed=11)
    out = jpeg_decode(jpeg_encode_progressive(img, quant=1))
    assert np.array_equal(out[:, :, 0], img)


def test_progressive_sparse_ac_refinement_paths():
    """Sparse high-frequency content exercises ZRL-in-refinement and
    newly-significant insertion after long zero runs."""
    img = np.full((32, 40), 128, np.uint8)
    img[3, 39] = 255
    img[17, 2] = 0
    img[25, 25] = 130
    base = jpeg_decode(jpeg_encode(img, quant=1))
    prog = jpeg_decode(jpeg_encode_progressive(img, quant=1, ac_al=2))
    assert np.array_equal(base, prog)


def test_progressive_eobrun_hand_built_stream():
    """EOB runs LONGER than one block (EOBn symbols, r>0) — the encoder
    flushes runs per block, so pin the decoder's multi-block run path with
    a hand-built stream: 4 blocks wide, one DC scan, then an AC scan whose
    single EOB3 symbol (r=1, 1 extra bit = 1 → run of 3) covers blocks
    1-3 after block 0 places one coefficient."""
    from no_fasel_scrapers_spark.operators.jpeg import (
        _mag_bits as mb,
    )

    dc_t = _huff_codes(*_K3_DC_LUM)
    # custom AC table containing EOB1 (0x10): 0x00/0x10/0x01 at length 2,
    # 0x02 at length 3 (canonical, all-ones code unused)
    ac_bits = [0, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x00, 0x10, 0x01, 0x02]
    ac_t = _huff_codes(ac_bits, ac_vals)

    # DC scan (Ss=0 Se=0 Ah=0 Al=0): 4 blocks, DC diffs 64, 0, 0, 0
    bw = _BitWriter()
    code, ln = dc_t[7]
    bw.write(code, ln)
    bw.write(mb(64, 7), 7)
    for _ in range(3):
        code, ln = dc_t[0]
        bw.write(code, ln)
    bw.flush()
    dc_scan = bytes(bw.out)

    # AC scan (Ss=1 Se=63 Ah=0 Al=0): block 0 = coef at k=1 value 3 then
    # EOB0; blocks 1-3 covered by one EOB3 = (r=1, extra bit 1)
    bw = _BitWriter()
    code, ln = ac_t[0x02]  # (run 0, size 2)
    bw.write(code, ln)
    bw.write(mb(3, 2), 2)
    code, ln = ac_t[0x00]  # EOB0 ends block 0
    bw.write(code, ln)
    code, ln = ac_t[0x10]  # EOB1: run = 2 + extra
    bw.write(code, ln)
    bw.write(1, 1)         # extra bit → run of 3
    bw.flush()
    ac_scan = bytes(bw.out)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += _seg(0xC2, struct.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(_K3_DC_LUM[0]) + bytes(_K3_DC_LUM[1]))
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    out += dc_scan
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    out += ac_scan
    out += b"\xff\xd9"

    dec = jpeg_decode(bytes(out))[:, :, 0]
    # expected: every block has DC=64 (pred chain) → flat 192 after level
    # shift & orthonormal scaling (64/8=8 per sample... verified against
    # the same coefficients through the baseline path below)
    from no_fasel_scrapers_spark.operators.jpeg import _idct

    m0 = np.zeros((8, 8))
    m0[0, 0] = 64
    m0[0, 1] = 3  # zigzag k=1 = (0,1)
    b0 = np.clip(np.rint(_idct(m0) + 128.0), 0, 255)
    mr = np.zeros((8, 8))
    mr[0, 0] = 64
    br_ = np.clip(np.rint(_idct(mr) + 128.0), 0, 255)
    expect = np.concatenate([b0] + [br_] * 3, axis=1)
    assert np.array_equal(dec, expect.astype(np.uint8))


def test_progressive_media_pipeline_features(spark):
    """media_features over a VALID progressive payload: real histogram
    features, in lockstep with the same arithmetic the oracle would
    compute from the source pixels (decode is bit-exact on block-constant
    input, so the histogram is exactly the source histogram)."""
    img = np.kron(
        _block_constant(1, 2, seed=21)[::8, ::8],
        np.ones((16, 16), np.uint8),
    ).astype(np.uint8)  # 16×32
    df = spark.createDataFrame(
        [(0, bytes(jpeg_encode_progressive(img, quant=1)))],
        "media_id long, payload binary",
    )
    row = extract_features(with_media_metadata(df)).collect()[0]
    assert (row.codec, row.width, row.height, row.channels) == (
        "jpeg", 32, 16, 1,
    )
    hist, _ = np.histogram(img, bins=16, range=(0, 256))
    expect = (hist / hist.sum()).astype(np.float32)
    assert np.allclose(row.features, expect)
