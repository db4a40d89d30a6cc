"""Magic-byte MIME router (operators/mime.py): value parity against a
pure-Python twin over payloads built by the REAL codecs, plan pins
(zero Python, zero shuffle, codegen), and the crawl-fixture property
that every mini-web page routes to 'html' — including the cp1256 ones.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from no_fasel_scrapers_spark.operators.avi import avi_encode
from no_fasel_scrapers_spark.operators.gif import gif_encode
from no_fasel_scrapers_spark.operators.jpeg import jpeg_encode
from no_fasel_scrapers_spark.operators.mime import (
    MIME_KINDS,
    with_mime,
)
from no_fasel_scrapers_spark.operators.multimodal import png_encode
from no_fasel_scrapers_spark.operators.wav import wav_encode


def _py_twin(b: bytes | None) -> str:
    """Independent reimplementation of the routing rules (the oracle)."""
    if b is None or len(b) == 0:
        return "empty"
    if b.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if b.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if b.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
        return "wav"
    if b.startswith(b"RIFF") and b[8:12] == b"AVI ":
        return "avi"
    if b[4:8] == b"ftyp":
        return "mp4"
    if b.startswith(b"%PDF-"):
        return "pdf"
    if b.startswith(b"\x1f\x8b"):
        return "gzip"
    if b.startswith(b"PK\x03\x04"):
        return "zip"
    if b.startswith(b"\xff\xfe") and b[2:4] == b"<\x00":
        return "html"
    if b.startswith(b"\xfe\xff") and b[2:4] == b"\x00<":
        return "html"
    if b.startswith(b"\xef\xbb\xbf") and b[3:4] == b"<":
        return "html"
    # leading ASCII whitespace ONLY, then '<', within the 16-byte head
    i = 0
    while i < min(len(b), 15) and b[i] in b" \t\n\x0b\f\r":
        i += 1
    if i <= 15 and b[i:i + 1] == b"<":
        return "html"
    head = b[:8]
    if head and all(0x09 <= c <= 0x7E for c in head):
        return "text"
    return "unknown"


def _menu() -> list[bytes | None]:
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    frames = [img[:, :, None], (img + 7)[:, :, None]]
    return [
        png_encode(img[:, :, None]),
        jpeg_encode(img, quant=1),
        gif_encode(img),
        wav_encode(np.zeros((100, 1), dtype=np.int16), 8000),
        avi_encode([f[:, :, 0] for f in frames], fps=5),
        b"\x00\x00\x00\x18ftypmp42\x00\x00\x00\x00mp42isom",
        b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n1 0 obj",
        b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03" + b"x" * 20,
        b"PK\x03\x04\x14\x00\x00\x00" + b"y" * 20,
        b"<html><body>plain</body></html>",
        b"   \n\t <!DOCTYPE html><html></html>",
        b"\xef\xbb\xbf<html>bommed</html>",
        b"\xff\xfe" + "<html>16le</html>".encode("utf-16-le"),
        b"\xfe\xff" + "<html>16be</html>".encode("utf-16-be"),
        '<meta charset="windows-1256">صفحة'.encode("cp1256"),
        b"User-agent: *\nDisallow: /private\n",
        b"\x00\x01\x02\x03binarygarbage",
        b"\xde\xad\xbe\xef",
        b"",
        None,
        b"RIFF\x10\x00\x00\x00JUNKxxxx",  # RIFF but neither WAVE nor AVI
        # round-5 review regressions:
        b"\x00\x8f<\x02garbage",     # '<' after binary junk is NOT html
        b"abcdefg\x85tail",          # trailing NEL must not pass \Z-style
        b"ab\x85",                   # short head ending in NEL
        b"  \t<svg>leading ws</svg>",  # ws-then-'<' IS html
    ]


class TestMimeRouter:
    def test_matches_python_twin(self, spark):
        menu = _menu()
        df = spark.createDataFrame(
            [(i, p) for i, p in enumerate(menu)],
            "i long, html binary",
        )
        got = {r.i: r.mime_kind for r in with_mime(df).collect()}
        for i, p in enumerate(menu):
            assert got[i] == _py_twin(p), (i, p and p[:16])
        assert set(got.values()) <= set(MIME_KINDS)
        # the menu exercises every kind except none
        assert set(got.values()) >= {
            "png", "jpeg", "gif", "wav", "avi", "mp4", "pdf", "gzip",
            "zip", "html", "text", "unknown", "empty",
        }

    def test_plan_is_codegen_only(self, spark):
        df = spark.createDataFrame([(b"<html>",)], "html binary")
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            with_mime(df).explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "MapInPandas" not in plan
        assert "codegen id" in plan

    def test_fixture_pages_all_route_html(self, spark, fixture):
        df = fixture.pages_df(spark)
        kinds = (
            with_mime(df).groupBy("mime_kind").count().collect()
        )
        assert {r.mime_kind for r in kinds} == {"html"}

    def test_riff_without_known_tag_is_not_media(self):
        # control bytes in the size field keep it out of 'text' too
        assert _py_twin(b"RIFF\x10\x00\x00\x00JUNKxxxx") == "unknown"
