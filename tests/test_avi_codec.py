"""MJPEG-in-AVI container codec (operators/avi.py).

Same verification shape as the WAV/GIF codecs: encode→decode round trip
pinned against the JPEG codec twin byte-for-byte, header parse without
touching frame bytes, cut-at-every-offset truncation contract, honest
NotImplementedError seam for inter-frame codecs, and the Spark-side
``sample_frames`` path decoding real AVI payloads inside Arrow batches.
"""

import struct

import numpy as np
import pytest

from no_fasel_scrapers_spark.operators.avi import (
    avi_decode_frames,
    avi_encode,
    avi_frame_chunks,
    avi_header,
)
from no_fasel_scrapers_spark.operators.jpeg import jpeg_decode, jpeg_encode


def _frames(n=5, h=16, w=24, ch=3, seed=7):
    rng = np.random.default_rng(seed)
    # smooth-ish content (gradient + small noise) so JPEG stays honest
    # without the test depending on noise statistics
    base = (
        np.arange(h)[:, None, None] * 3
        + np.arange(w)[None, :, None] * 5
    ) % 256
    out = []
    for i in range(n):
        f = (base + i * 11 + rng.integers(0, 8, (h, w, ch))) % 256
        out.append(f.astype(np.uint8)[:, :, 0] if ch == 1 else
                   f.astype(np.uint8))
    return out


class TestAviCodec:
    def test_header_and_chunk_bytes_are_the_codec_twin(self):
        frames = _frames(n=4)
        payload = avi_encode(frames, fps=12)
        meta = avi_header(payload)
        assert meta["codec"] == "mjpeg"
        assert (meta["width"], meta["height"]) == (24, 16)
        assert meta["channels"] == 3
        assert meta["n_frames"] == 4
        assert meta["fps"] == 12.0
        # the stored 00dc chunks ARE jpeg_encode's output, byte-for-byte
        chunks = list(avi_frame_chunks(payload, meta))
        assert len(chunks) == 4
        for f, c in zip(frames, chunks):
            assert bytes(c) == jpeg_encode(f, quant=1, subsampling="4:4:4")

    def test_decode_matches_jpeg_twin_and_skips_unsampled(self):
        frames = _frames(n=6, ch=1)
        payload = avi_encode(frames, fps=24)
        got = dict(avi_decode_frames(payload, indices=[0, 2, 5]))
        assert sorted(got) == [0, 2, 5]
        for i in got:
            want = jpeg_decode(jpeg_encode(frames[i], quant=1,
                                           subsampling="4:4:4"))
            if want.ndim == 2:
                want = want[:, :, None]
            assert np.array_equal(got[i], want)
        # gray stream advertises 1 channel via biBitCount=8
        assert avi_header(payload)["channels"] == 1

    def test_not_an_avi_returns_none(self):
        assert avi_header(None) is None
        assert avi_header(b"") is None
        assert avi_header(b"\x00" * 64) is None
        # a RIFF that is not AVI (WAVE) is someone else's payload
        from no_fasel_scrapers_spark.operators.wav import wav_encode

        wav = wav_encode(np.zeros(8, dtype=np.int16), 8000)
        assert avi_header(wav) is None

    def test_truncation_raises_at_every_cut(self):
        payload = avi_encode(_frames(n=2, h=8, w=8), fps=10)
        for cut in range(12, len(payload)):
            with pytest.raises(ValueError):
                avi_header(payload[:cut])
        # cuts inside the magic can only say "not an AVI"
        for cut in range(12):
            assert avi_header(payload[:cut]) is None
        # trailing garbage past the declared RIFF size is ignored
        assert avi_header(payload + b"JUNKJUNK")["n_frames"] == 2

    def test_non_mjpeg_stream_is_the_honest_seam(self):
        payload = bytearray(avi_encode(_frames(n=2, h=8, w=8), fps=10))
        # rewrite both fccHandler and biCompression to H264
        n = payload.count(b"MJPG")
        assert n == 2
        patched = bytes(payload).replace(b"MJPG", b"H264")
        with pytest.raises(NotImplementedError, match="H264"):
            avi_header(patched)

    def test_shape_mismatch_rejected(self):
        with pytest.raises(ValueError, match="shape"):
            avi_encode([np.zeros((8, 8), np.uint8),
                        np.zeros((8, 9), np.uint8)])
        with pytest.raises(ValueError, match="frame"):
            avi_encode([])

    def test_idx1_entries_point_at_the_chunks(self):
        """The written idx1 is spec-correct even though our decoder walks
        movi directly: each entry's offset (from the movi fourcc) lands on
        its 00dc chunk header and its size matches."""
        payload = avi_encode(_frames(n=3, h=8, w=8), fps=10)
        meta = avi_header(payload)
        movi_fourcc = meta["_movi_off"] - 4
        # find idx1
        pos = payload.rindex(b"idx1")
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        assert size == 3 * 16
        for k in range(3):
            ckid, flags, off, ln = struct.unpack_from(
                "<4sIII", payload, pos + 8 + 16 * k
            )
            assert ckid == b"00dc" and flags == 0x10
            at = movi_fourcc + off
            assert payload[at:at + 4] == b"00dc"
            (csize,) = struct.unpack_from("<I", payload, at + 4)
            assert csize == ln


class TestAviMultiStream:
    def _two_stream_avi(self):
        """Hand-splice a second (audio-ish) stream: an extra strl AFTER
        the vids strl and interleaved '01dc' chunks inside movi — a
        correct reader must skip both."""
        from no_fasel_scrapers_spark.operators.avi import (
            _AVIH, _STRH, _chunk, _list,
        )

        frames = _frames(n=3, h=8, w=8, ch=1)
        jpegs = [jpeg_encode(f, quant=1, subsampling="4:4:4")
                 for f in frames]
        avih = struct.pack(_AVIH, 100000, 0, 0, 0x10, 3, 0, 2, 0, 8, 8,
                           0, 0, 0, 0)
        strh_v = struct.pack(_STRH, b"vids", b"MJPG", 0, 0, 0, 0, 1, 10,
                             0, 3, 0, 0, 0, 0, 0, 8, 8)
        strf_v = struct.pack("<IiiHH4sIiiII", 40, 8, 8, 1, 8, b"MJPG",
                             64, 0, 0, 0, 0)
        strh_a = struct.pack(_STRH, b"auds", b"\x00\x00\x00\x00", 0, 0,
                             0, 0, 1, 8000, 0, 100, 0, 0, 1, 0, 0, 0, 0)
        strf_a = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        hdrl = _list(
            b"hdrl",
            _chunk(b"avih", avih)
            + _list(b"strl", _chunk(b"strh", strh_v)
                    + _chunk(b"strf", strf_v))
            + _list(b"strl", _chunk(b"strh", strh_a)
                    + _chunk(b"strf", strf_a)),
        )
        movi = b"".join(
            _chunk(b"00dc", j) + _chunk(b"01dc", b"\x01\x02\x03")
            for j in jpegs
        )
        body = hdrl + _list(b"movi", movi)
        payload = (b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI "
                   + body)
        return payload, frames

    def test_second_stream_chunks_are_skipped(self):
        payload, frames = self._two_stream_avi()
        meta = avi_header(payload)
        assert meta["_stream"] == 0 and meta["n_frames"] == 3
        chunks = list(avi_frame_chunks(payload, meta))
        # exactly the three 00dc chunks; the interleaved 01dc junk
        # (which is not even a JPEG) never reaches the decoder
        assert len(chunks) == 3
        for f, c in zip(frames, chunks):
            assert bytes(c) == jpeg_encode(f, quant=1, subsampling="4:4:4")
        got = dict(avi_decode_frames(payload))
        assert sorted(got) == [0, 1, 2]


class TestAviSampleFrames:
    def test_spark_samples_avi_and_nfsv_side_by_side(self, spark):
        from no_fasel_scrapers_spark.operators.multimodal import (
            fake_video_encode,
            png_decode,
            sample_frames,
        )

        frames = _frames(n=5, h=8, w=12)
        vids = [
            (0, avi_encode(frames, fps=10)),
            (1, fake_video_encode(8, 8, 1, n_frames=3, seed=7, fps=10)),
            (2, None),
        ]
        df = spark.createDataFrame(vids, "media_id long, payload binary")
        out = sample_frames(df, stride=2).collect()
        by_vid = {}
        for r in out:
            by_vid.setdefault(r.media_id, []).append(r)
        assert sorted(r.frame_idx for r in by_vid[0]) == [0, 2, 4]
        assert sorted(r.frame_idx for r in by_vid[1]) == [0, 2]
        assert 2 not in by_vid
        # ts from the container fps (10 fps → frame 4 at 400 ms)
        ts = {r.frame_idx: r.ts_ms for r in by_vid[0]}
        assert ts[0] == 0 and ts[4] == 400
        # each emitted frame is a real PNG whose pixels equal the JPEG
        # codec twin's decode of the stored chunk
        r2 = next(r for r in by_vid[0] if r.frame_idx == 2)
        want = jpeg_decode(jpeg_encode(frames[2], quant=1,
                                       subsampling="4:4:4"))
        assert np.array_equal(png_decode(bytes(r2.frame)), want)

    def test_strict_seam_and_skip(self, spark):
        from no_fasel_scrapers_spark.operators.multimodal import (
            sample_frames,
        )

        truncated = avi_encode(_frames(n=2, h=8, w=8), fps=10)[:-20]
        h264 = avi_encode(_frames(n=2, h=8, w=8), fps=10).replace(
            b"MJPG", b"H264"
        )
        df = spark.createDataFrame(
            [(0, truncated), (1, h264),
             (2, b"\x00\x00\x00 ftypmp42")],
            "media_id long, payload binary",
        )
        with pytest.raises(Exception, match="truncated|PyAV|ffmpeg"):
            sample_frames(df).collect()
        assert sample_frames(df, strict=False).count() == 0

    def test_strict_false_skips_movi_and_frame_corruption(self, spark):
        """strict=False must also skip rows whose headers parse but whose
        movi list or frame bytes are corrupt (round-5 review find: the
        try only wrapped avi_header)."""
        from no_fasel_scrapers_spark.operators.multimodal import (
            sample_frames,
        )

        good = avi_encode(_frames(n=2, h=8, w=8), fps=10)
        # corrupt a 00dc size field inside movi: headers stay valid
        movi_at = good.index(b"LIST", 12)
        dc_at = good.index(b"00dc", movi_at)
        bad_movi = bytearray(good)
        bad_movi[dc_at + 4:dc_at + 8] = struct.pack("<I", 0xFFFFFF)
        # corrupt the first frame's JPEG SOI: container walk succeeds,
        # jpeg_decode raises ValueError
        bad_jpeg = bytearray(good)
        bad_jpeg[dc_at + 8:dc_at + 10] = b"\x00\x00"
        df = spark.createDataFrame(
            [(0, bytes(bad_movi)), (1, bytes(bad_jpeg)), (2, good)],
            "media_id long, payload binary",
        )
        with pytest.raises(Exception, match="truncated|JPEG|jpeg"):
            sample_frames(df).collect()
        out = sample_frames(df, strict=False).collect()
        assert {r.media_id for r in out} == {2}
