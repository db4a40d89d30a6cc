"""Charset sniffing + decoding at the engine's one bytes→str boundary.

Real Common-Crawl page bytes arrive in many encodings.  The reference
scrapers lean on requests' ``Response.text`` guess (e.g.
``FaselSeriesScraper.py``'s ``requests.get(...).text`` calls), and until
round 5 this engine hard-decoded utf-8 — correct for the reference's
modern utf-8 sites but wrong for the legacy windows-1256 / -1251 /
shift_jis share of a 100-TB crawl.  This module implements the WHATWG
HTML-standard byte-sniffing ladder as a pure function:

1. **BOM** (utf-8 / utf-16le / utf-16be) — always wins;
2. **meta prescan** over the first 1024 bytes (``<meta charset=...>`` or
   the ``http-equiv`` ``content="...; charset=..."`` form, both caught by
   one in-tag pattern);
3. **default utf-8** (the spec's confidence-tentative default for a
   crawl corpus that is >95% utf-8).

It is consumed by ``functions/html_select.parse_html`` (and its stdlib
parity oracle), so every extractor — and the crawl_e2e Python oracle
scheduler, which shares ``extract_page`` — inherits it without a second
implementation.

Label normalization follows the WHATWG Encoding registry for labels that
appear in real crawls, including the deliberate superset mappings
(iso-8859-1/ascii → windows-1252, gb2312 → gbk) and the rule that a meta
label claiming utf-16 means utf-8 (ASCII-shaped bytes claiming utf-16
are lying; real utf-16 was caught by the BOM step).  Unknown labels fall
back to utf-8.  ``x-user-defined`` (a private-use-area mapping Python
lacks) is implemented directly — a 256-entry table per the WHATWG spec.

Everything here is per-row pure-Python by necessity (codecs), but it
runs INSIDE the existing Arrow extract batches — the sniff touches at
most 1024 bytes and the decode replaces, not adds to, the old
``bytes.decode`` call, so the hot path gains only the prescan regex.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pyspark/pandas only needed by with_decoded_html
    from pyspark.sql import DataFrame

__all__ = ["sniff_charset", "decode_html", "with_decoded_html"]

# WHATWG label → python codec, for the labels worth carrying in a crawl
# engine (the full registry is ~220 labels; unknowns fall back to utf-8,
# which the sniff result makes visible as source='default').
_LABELS = {
    # utf-8 family
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    # windows-1252 and everything the spec folds into it
    "windows-1252": "cp1252", "cp1252": "cp1252", "x-cp1252": "cp1252",
    "iso-8859-1": "cp1252", "iso8859-1": "cp1252", "latin1": "cp1252",
    "l1": "cp1252", "ascii": "cp1252", "us-ascii": "cp1252",
    "x-user-defined": "x-user-defined",  # WHATWG codec, implemented below
    # arabic
    "windows-1256": "cp1256", "cp1256": "cp1256",
    "iso-8859-6": "iso-8859-6", "arabic": "iso-8859-6",
    # cyrillic
    "windows-1251": "cp1251", "cp1251": "cp1251",
    "koi8-r": "koi8-r", "koi8": "koi8-r",
    "iso-8859-5": "iso-8859-5",
    # greek / hebrew / turkish / thai / baltic / central-european
    "windows-1253": "cp1253", "iso-8859-7": "iso-8859-7",
    "windows-1255": "cp1255", "iso-8859-8": "iso-8859-8",
    "windows-1254": "cp1254", "iso-8859-9": "cp1254",
    "windows-874": "cp874", "tis-620": "cp874", "iso-8859-11": "cp874",
    "windows-1257": "cp1257", "iso-8859-13": "iso-8859-13",
    "windows-1250": "cp1250", "iso-8859-2": "iso-8859-2",
    "iso-8859-15": "iso-8859-15", "latin9": "iso-8859-15",
    "iso-8859-4": "iso-8859-4", "iso-8859-10": "iso-8859-10",
    "iso-8859-14": "iso-8859-14", "iso-8859-16": "iso-8859-16",
    "iso-8859-3": "iso-8859-3", "macintosh": "mac-roman",
    "windows-1258": "cp1258",
    # CJK
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "ms932": "shift_jis", "ms_kanji": "shift_jis", "x-sjis": "shift_jis",
    "euc-jp": "euc-jp", "x-euc-jp": "euc-jp",
    "iso-2022-jp": "iso-2022-jp",
    "gb2312": "gbk", "gbk": "gbk", "x-gbk": "gbk", "gb_2312": "gbk",
    "chinese": "gbk", "csgb2312": "gbk", "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5", "cn-big5": "big5",
    "euc-kr": "euc-kr", "korean": "euc-kr", "ks_c_5601-1987": "euc-kr",
    # utf-16 labels in META mean "the author lied": real utf-16 bytes
    # were caught by the BOM step, ASCII-shaped bytes get utf-8
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
    "unicode": "utf-8", "ucs-2": "utf-8",
}

# The meta prescan parses ATTRIBUTES, as the WHATWG algorithm does — a
# bare "charset=" substring match would let a meta DESCRIPTION that
# merely mentions a charset hijack the document encoding, and would
# honor charset-bearing non-meta tags like SVG <metadata> (both
# round-5 review finds, confirmed live).  A label is honored from (a) a
# real charset attribute, or (b) the content attribute of an
# http-equiv=content-type meta — nothing else.
_META_TAG = re.compile(rb"<meta[\s/][^>]{0,1000}", re.IGNORECASE)
_ATTR = re.compile(
    rb"([a-zA-Z-]+)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>/]+)"
)
_CONTENT_CHARSET = re.compile(
    rb"charset\s*=\s*[\"']?\s*([a-zA-Z0-9._:-]+)", re.IGNORECASE
)

_PRESCAN_BYTES = 1024  # WHATWG: "up to the first 1024 bytes"
_COMMENT = re.compile(rb"<!--.*?-->", re.S)


def _meta_label(head: bytes) -> bytes | None:
    """First honored charset label in the prescan window, or None."""
    for m in _META_TAG.finditer(head):
        attrs: dict[bytes, bytes] = {}
        for am in _ATTR.finditer(m.group(0)[5:]):
            k, v = am.group(1).lower(), am.group(2)
            if v[:1] in (b'"', b"'"):
                v = v[1:-1] if len(v) >= 2 and v[-1:] == v[:1] else v[1:]
            attrs.setdefault(k, v)
        label = attrs.get(b"charset", b"").strip()
        if label:
            return label
        if attrs.get(b"http-equiv", b"").strip().lower() == b"content-type":
            c = _CONTENT_CHARSET.search(attrs.get(b"content", b""))
            if c:
                return c.group(1)
    return None


def sniff_charset(payload: bytes | bytearray) -> tuple[str, str]:
    """Sniff a page's charset → ``(python_codec, source)`` with source in
    ``{'bom', 'meta', 'default'}``.  Never raises; never reads past the
    BOM + first 1024 bytes."""
    b = bytes(payload)
    if b[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", "bom"
    if b[:2] == b"\xff\xfe":
        return "utf-16-le", "bom"
    if b[:2] == b"\xfe\xff":
        return "utf-16-be", "bom"
    head = b[:_PRESCAN_BYTES]
    if b"<!--" in head:  # rare: avoid the sub allocation on the hot path
        head = _COMMENT.sub(b"", head)
        dangling = head.find(b"<!--")  # unclosed comment swallows the rest
        if dangling != -1:
            head = head[:dangling]
    raw = _meta_label(head)
    if raw is not None:
        label = raw.decode("ascii", "ignore").strip().lower()
        codec = _LABELS.get(label)
        if codec is None:
            if label.startswith(("utf-32", "utf_32", "utf32")):
                # same lying-meta rule as utf-16: real utf-32 bytes could
                # not have carried this ASCII-shaped declaration
                return "utf-8", "meta"
            # a label outside the carried table: accept it iff python can
            # actually TEXT-decode with it — codecs.lookup alone also
            # matches bytes-to-bytes codecs (hex/base64/zlib/rot13/uu),
            # whose later .decode() raises LookupError; one adversarial
            # page must never crash an extract wave
            try:
                b"<".decode(label)
                codec = label
            except Exception:
                return "utf-8", "default"
        return codec, "meta"
    return "utf-8", "default"


def decode_html(payload: bytes | bytearray | None) -> str:
    """bytes → str via the sniffing ladder, errors='replace' throughout
    (a crawl never raises on mojibake — U+FFFD is data).  utf-16 BOM
    bytes are stripped, matching utf-8-sig's behavior."""
    if payload is None:
        return ""
    b = bytes(payload)
    return _decode_with(b, *sniff_charset(b))


# WHATWG x-user-defined: ASCII passes through, 0x80-0xFF map to the
# private-use range U+F780-U+F7FF.  Python has no codec for it, but the
# mapping is a 256-entry table — implement it rather than diverge
# (sites use it to smuggle binary through XHR as "text").
_X_USER_DEFINED = {i: i if i < 0x80 else 0xF780 - 0x80 + i
                   for i in range(256)}


def _decode_with(b: bytes, codec: str, source: str) -> str:
    if source == "bom" and codec.startswith("utf-16"):
        b = b[2:]
    if codec == "x-user-defined":
        return b.decode("latin-1").translate(_X_USER_DEFINED)
    try:
        return b.decode(codec, "replace")
    except Exception:
        # contract: this boundary NEVER raises — any codec that slips
        # through the sniff probe (or fails mid-stream in an exotic way)
        # degrades to the default, exactly as if the label were unknown
        return b.decode("utf-8", "replace")


def with_decoded_html(
    df: DataFrame, payload_col: str = "payload", out_col: str = "text"
) -> DataFrame:
    """(.., payload binary) → same rows + (charset, source, out_col str).

    The DataFrame-level wrapper: one ``mapInPandas`` pass (Arrow batches,
    per-row decode — a narrow map, zero shuffle) adding the sniffed
    charset, its provenance, and the decoded text.  At 100 TB this is
    the same shape as the extract stage it normally fuses into: decode
    cost rides the fetch partitioning, nothing re-partitions.
    """
    clash = {"charset", "source", out_col} & set(df.columns)
    if clash:
        # silent overwrite would clobber input data AND emit a duplicate
        # name in the DDL schema (round-5 review find) — fail loudly
        raise ValueError(
            f"with_decoded_html output columns collide with input: "
            f"{sorted(clash)}; rename or drop them first"
        )
    sch = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", charset string, source string, {out_col} string"

    def _batches(it):
        for pdf in it:
            charsets, sources, texts = [], [], []
            for p in pdf[payload_col]:
                b = bytes(p) if p is not None else b""
                codec, source = sniff_charset(b)
                charsets.append(codec)
                sources.append(source)
                texts.append(_decode_with(b, codec, source))
            pdf = pdf.copy()
            pdf["charset"] = charsets
            pdf["source"] = sources
            pdf[out_col] = texts
            yield pdf

    return df.mapInPandas(_batches, schema=sch)


# ---------------------------------------------------------------------------
# Deterministic fixture for the charset_decode registry query.  Input
# GENERATION only — the operator under test is sniff_charset/decode_html
# above; the analytic oracle (oracle/analytic.py::charset_decode_rows)
# predicts the decode results from the lane table independently of them.
# ---------------------------------------------------------------------------

# (python codec used to ENCODE, meta label planted, expected sniff source)
SYNTH_LANES = [
    ("utf-8", "UTF8", "meta"),            # label-normalization: utf8→utf-8
    ("cp1256", "Windows-1256", "meta"),   # arabic windows codepage
    ("cp1252", "iso-8859-1", "meta"),     # WHATWG latin1→1252 superset rule
    ("utf-16-le", "utf-16", "bom"),       # BOM wins over a lying meta
    ("utf-8", None, "default"),           # no declaration at all
]


def synth_page(doc_id: int, text: str) -> tuple[bytes, str, str, str]:
    """→ (payload, expected_decoded_page, codec, source) for lane
    ``doc_id % 5``.  The body carries an Arabic title so cp1256 vs
    cp1252 actually differ (cp1252 cannot encode it; errors='replace'
    turns it into deterministic '?').  ``expected`` is the
    encode-roundtrip of the page string — what a CORRECT sniff+decode
    must return byte-for-byte (utf-16 lane: BOM-stripped original)."""
    codec, label, source = SYNTH_LANES[doc_id % 5]
    meta = f'<meta charset="{label}">' if label else ""
    page = (
        f"<html><head>{meta}<title>صفحة {doc_id}"
        f"</title></head><body><p>{text}</p></body></html>"
    )
    if codec == "utf-16-le":
        return b"\xff\xfe" + page.encode("utf-16-le"), page, codec, source
    payload = page.encode(codec, "replace")
    return payload, payload.decode(codec), codec, source
