"""Charset sniffing ladder (functions/charset.py) — the round-5 fix for
the engine's utf-8-only bytes→str boundary.

Pins: BOM > meta > default precedence, WHATWG label normalization
(incl. the iso-8859-1→windows-1252 and gb2312→gbk superset rules and
meta-utf-16→utf-8), the 1024-byte prescan window, comment skipping,
never-raises decoding, and the end-to-end property that matters — a
windows-1256 Arabic page extracts the SAME text as its utf-8 twin
through the real ``parse_html`` path every extractor uses.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from no_fasel_scrapers_spark.functions.charset import (
    decode_html,
    sniff_charset,
    synth_page,
)
from no_fasel_scrapers_spark.functions.html_select import (
    parse_html,
    parse_html_stdlib,
)


def _page(meta: str, body: str = "x") -> bytes:
    return f"<html><head>{meta}</head><body>{body}</body></html>".encode()


class TestSniff:
    @pytest.mark.parametrize("label,codec", [
        ("utf-8", "utf-8"), ("UTF8", "utf-8"),
        ("iso-8859-1", "cp1252"), ("latin1", "cp1252"),
        ("ascii", "cp1252"), ("x-user-defined", "x-user-defined"),
        ("Windows-1256", "cp1256"), ("ISO-8859-6", "iso-8859-6"),
        ("windows-1251", "cp1251"), ("koi8-r", "koi8-r"),
        ("Shift_JIS", "shift_jis"), ("gb2312", "gbk"),
        ("GB18030", "gb18030"), ("Big5", "big5"), ("euc-kr", "euc-kr"),
        ("tis-620", "cp874"), ("iso-8859-9", "cp1254"),
        # a meta claiming utf-16 over ASCII-shaped bytes is lying
        ("utf-16", "utf-8"), ("UTF-16LE", "utf-8"),
    ])
    def test_label_normalization(self, label, codec):
        got, src = sniff_charset(_page(f'<meta charset="{label}">'))
        assert (got, src) == (codec, "meta")

    def test_http_equiv_content_type_form(self):
        got, src = sniff_charset(_page(
            '<meta http-equiv="Content-Type" '
            'content="text/html; charset=windows-1256">'
        ))
        assert (got, src) == ("cp1256", "meta")

    def test_unquoted_and_spaced_label(self):
        assert sniff_charset(_page("<meta charset = utf-8 >"))[0] == "utf-8"

    def test_unknown_label_falls_back(self):
        assert sniff_charset(_page('<meta charset="klingon-9">')) == (
            "utf-8", "default",
        )

    def test_python_known_label_outside_table(self):
        # cp866 is absent from the carried table but python knows it
        assert sniff_charset(_page('<meta charset="cp866">')) == (
            "cp866", "meta",
        )

    def test_no_meta_defaults(self):
        assert sniff_charset(b"<html><body>hi</body></html>") == (
            "utf-8", "default",
        )

    def test_bom_beats_lying_meta(self):
        page = '<meta charset="windows-1256">hello'
        assert sniff_charset(b"\xef\xbb\xbf" + page.encode()) == (
            "utf-8-sig", "bom",
        )
        assert sniff_charset(
            b"\xff\xfe" + page.encode("utf-16-le")
        ) == ("utf-16-le", "bom")
        assert sniff_charset(
            b"\xfe\xff" + page.encode("utf-16-be")
        ) == ("utf-16-be", "bom")

    def test_meta_past_1024_bytes_is_ignored(self):
        pad = b"<!DOCTYPE html><html><head>" + b" " * 1024
        page = pad + b'<meta charset="windows-1256"></head>'
        assert sniff_charset(page) == ("utf-8", "default")

    def test_charset_in_text_not_a_tag_is_ignored(self):
        # [^>] cannot cross a tag close: charset= inside page TEXT or in
        # a non-meta tag's text never matches
        assert sniff_charset(
            b"<html><body>use charset=windows-1256 here</body></html>"
        ) == ("utf-8", "default")

    def test_description_mentioning_charset_is_not_honored(self):
        # round-5 review find: 'charset=' inside an unrelated attribute
        # VALUE (a meta description) must not hijack the encoding — the
        # prescan parses attributes like the WHATWG algorithm
        assert sniff_charset(
            b'<meta name="description" '
            b'content="set charset=shift_jis in html">'
        ) == ("utf-8", "default")

    def test_non_meta_tag_with_charset_attr_is_ignored(self):
        # <metadata> (SVG) starts with 'meta' but is not a meta tag
        assert sniff_charset(
            b'<svg><metadata charset="koi8-r">x</metadata></svg>'
        ) == ("utf-8", "default")

    def test_http_equiv_required_for_content_form(self):
        # a content attribute carrying charset= WITHOUT
        # http-equiv=content-type is not a declaration
        assert sniff_charset(
            b'<meta content="text/html; charset=windows-1256">'
        ) == ("utf-8", "default")
        # ...but with it, it is (order-independent attributes)
        assert sniff_charset(
            b'<meta content="text/html; charset=windows-1256" '
            b'http-equiv="Content-Type">'
        ) == ("cp1256", "meta")

    def test_commented_out_meta_is_skipped(self):
        assert sniff_charset(
            b'<!-- <meta charset="windows-1256"> --><meta charset="utf-8">'
        ) == ("utf-8", "meta")
        # unclosed comment swallows the rest of the window
        assert sniff_charset(
            b'<!-- oops <meta charset="windows-1256">'
        ) == ("utf-8", "default")


class TestDecode:
    def test_cp1256_roundtrip(self):
        body = "مسلسل الاختيار الحلقة 12"
        raw = (
            '<meta charset="windows-1256"><title>%s</title>' % body
        ).encode("cp1256")
        assert body in decode_html(raw)

    def test_x_user_defined_maps_high_bytes_to_private_use(self):
        raw = b'<meta charset="x-user-defined">ab\x80\xff'
        got = decode_html(raw)
        assert got.endswith("ab")

    def test_utf16_bom_stripped(self):
        s = decode_html(b"\xff\xfe" + "hi صفحة".encode("utf-16-le"))
        assert s == "hi صفحة"  # no U+FEFF residue

    def test_none_and_empty(self):
        assert decode_html(None) == ""
        assert decode_html(b"") == ""

    @pytest.mark.parametrize("label", ["hex", "base64", "zlib", "rot13",
                                       "uu", "bz2", "quopri"])
    def test_bytes_codec_labels_never_crash(self, label):
        # codecs.lookup knows these, but they are bytes-to-bytes codecs
        # whose .decode() raises LookupError — one adversarial page must
        # never crash an extract wave (round-5 review find)
        page = f'<meta charset="{label}">hello'.encode()
        assert sniff_charset(page) == ("utf-8", "default")
        assert decode_html(page) == page.decode()

    def test_utf32_meta_is_a_lie(self):
        # same rule as utf-16: ASCII-shaped bytes claiming utf-32 decode
        # as utf-8, not as length-4 code units of garbage
        page = b'<meta charset="utf-32">hello'
        assert sniff_charset(page) == ("utf-8", "meta")
        assert decode_html(page).endswith("hello")

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=300))
    def test_never_raises(self, b):
        got = decode_html(b)
        assert isinstance(got, str)

    @settings(max_examples=50, deadline=None)
    @given(st.binary(max_size=2000))
    def test_utf8_payloads_unchanged_vs_old_behavior(self, b):
        # pages with no BOM and no meta declaration decode exactly as the
        # pre-round-5 hard utf-8 path did — the golden corpus is in this
        # class, so byte-parity with the reference outputs is preserved
        # by construction
        if sniff_charset(b)[1] == "default":
            assert decode_html(b) == b.decode("utf-8", "replace")


class TestEndToEnd:
    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=600))
    def test_parse_html_never_raises_on_bytes(self, b):
        # the crash-safety property the crawl loop depends on: ANY fetch
        # payload routed to the extract lane parses to a tree (possibly
        # empty), never an exception — sniff, decode, and tokenizer all
        # included
        root = parse_html(b)
        assert root.tag == "[document]"

    def test_cp1256_page_extracts_same_text_as_utf8_twin(self):
        body = "فيلم الجريمة — الموسم 2"
        html = (
            '<html><head><meta charset="{}"><title>t</title></head>'
            "<body><div class=\"Title\">{}</div></body></html>"
        )
        utf8 = html.format("utf-8", body).encode("utf-8")
        arab = html.format("windows-1256", body).encode("cp1256")
        t_utf8 = parse_html(utf8).text
        t_1256 = parse_html(arab).text
        assert body in t_utf8 and t_utf8 == t_1256
        # and the stdlib parity oracle sees the identical tree text
        assert parse_html_stdlib(arab).text == t_1256

    def test_synth_page_lanes(self):
        seen = set()
        for i in range(10):
            payload, expected, codec, source = synth_page(i, "hello world")
            seen.add((codec, source))
            assert decode_html(payload) == expected
            assert sniff_charset(payload) == (codec, source)
        assert seen == {
            ("utf-8", "meta"), ("cp1256", "meta"), ("cp1252", "meta"),
            ("utf-16-le", "bom"), ("utf-8", "default"),
        }

    def test_cp1252_lane_replaces_arabic(self):
        _, expected, codec, _ = synth_page(2, "abc")
        assert codec == "cp1252" and "?" in expected and "صفحة" not in expected
