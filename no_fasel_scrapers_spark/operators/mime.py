"""Magic-byte MIME routing for raw crawl payloads — pure JVM columns.

A real fetch stream is not all HTML: it carries images, audio/video,
PDFs, archives, and plain text.  The reference scrapers never face this
(they GET known-HTML catalog URLs and image URLs separately,
``Common.py`` / the per-site scrapers), but a frontier crawl at 10^10
URLs must route every payload to the right lane BEFORE any Python touches
it: HTML to the extract stage, media to the multimodal decoders this
repo already ships (``operators/multimodal.py`` / ``jpeg.py`` /
``gif.py`` / ``wav.py`` / ``avi.py``), and the rest to typed
quarantine kinds.

``with_mime`` is intentionally zero-Python: every sniff is a
``substring``-on-binary comparison inside whole-stage codegen, so the
router costs one projection over the fetch partitioning — no shuffle,
no Arrow crossing, safe to run on 100 TB of payload bytes as the first
stage after fetch.  The HTML detection deliberately mirrors the charset
ladder's reality: an optional utf-8/utf-16 BOM, optional ASCII
whitespace, then ``<`` (covering ``<!DOCTYPE``, ``<html``, any tag —
real servers rarely send anything tidier).

Kinds emitted (a closed enum, so downstream lanes can be exhaustive):
``html text png jpeg gif wav avi mp4 pdf gzip zip unknown empty``.
``mp4 pdf gzip zip`` are identified-but-undecodable here (no codec libs
in-sandbox — same honest seam as the multimodal stubs); ``text`` is the
printable-ASCII-prefix fallback before ``unknown``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["mime_kind", "with_mime", "MIME_KINDS"]

MIME_KINDS = (
    "html", "text", "png", "jpeg", "gif", "wav", "avi", "mp4", "pdf",
    "gzip", "zip", "unknown", "empty",
)


def _pfx(col: Column, at: int, lit: bytes) -> Column:
    """payload[at:at+len(lit)] == lit (1-based substring, binary-safe)."""
    return F.substring(col, at + 1, len(lit)) == F.lit(lit)


def mime_kind(col: Column) -> Column:
    """binary payload → kind string (see MIME_KINDS).  Pure column
    expression: stays inside whole-stage codegen, pushes nothing to
    Python.  Order matters — container formats (RIFF) dispatch on their
    inner tag, HTML wins over generic text, text is the last resort
    before unknown."""
    # HTML rule: leading ASCII whitespace ONLY, then '<', within a
    # 16-byte head window (servers' leading whitespace in the wild is a
    # few bytes).  A '<' preceded by arbitrary binary junk must NOT
    # route to html (round-5 review find — ~6% of random binaries carry
    # a 0x3C in their head).  decode(...,'ISO-8859-1') is
    # byte-transparent, and \z (not \Z, which forgives a final line
    # terminator) anchors the probe exactly.
    html_like = F.decode(F.substring(col, 1, 16), "ISO-8859-1").rlike(
        r"\A[ \t\n\x0B\f\r]{0,15}<"
    )
    # a BOM'd document: skip 3 (utf-8) then '<' directly
    bom8 = _pfx(col, 0, b"\xef\xbb\xbf")

    n = F.length(col)
    return (
        F.when(col.isNull() | (n == 0), F.lit("empty"))
        .when(_pfx(col, 0, b"\x89PNG\r\n\x1a\n"), F.lit("png"))
        .when(_pfx(col, 0, b"\xff\xd8\xff"), F.lit("jpeg"))
        .when(
            _pfx(col, 0, b"GIF87a") | _pfx(col, 0, b"GIF89a"),
            F.lit("gif"),
        )
        .when(
            _pfx(col, 0, b"RIFF") & _pfx(col, 8, b"WAVE"), F.lit("wav")
        )
        .when(
            _pfx(col, 0, b"RIFF") & _pfx(col, 8, b"AVI "), F.lit("avi")
        )
        .when(_pfx(col, 4, b"ftyp"), F.lit("mp4"))
        .when(_pfx(col, 0, b"%PDF-"), F.lit("pdf"))
        .when(_pfx(col, 0, b"\x1f\x8b"), F.lit("gzip"))
        .when(_pfx(col, 0, b"PK\x03\x04"), F.lit("zip"))
        # utf-16 BOMs: the second probe byte is the NUL-interleaved '<'
        .when(
            (_pfx(col, 0, b"\xff\xfe") & _pfx(col, 2, b"<\x00"))
            | (_pfx(col, 0, b"\xfe\xff") & _pfx(col, 2, b"\x00<")),
            F.lit("html"),
        )
        .when(bom8 & _pfx(col, 3, b"<"), F.lit("html"))
        .when(html_like, F.lit("html"))
        # printable-ASCII head → generic text; the decode ladder will
        # still charset-sniff it downstream.  decode(..,'ISO-8859-1') is
        # byte-transparent and can never raise MALFORMED_CHARACTER_CODING
        # (a binary→string cast validates utf-8 under ANSI mode)
        .when(
            F.decode(F.substring(col, 1, 8), "ISO-8859-1").rlike(
                r"\A[\x09-\x7E]+\z"
            ),
            F.lit("text"),
        )
        .otherwise(F.lit("unknown"))
    )


def with_mime(
    df: DataFrame, payload_col: str = "html", out_col: str = "mime_kind"
) -> DataFrame:
    """Add the routed kind column.  One narrow projection — the 100-TB
    shape is 'filter by kind before anything expensive': downstream
    lanes prune both rows AND the payload column reads they skip."""
    return df.withColumn(out_col, mime_kind(F.col(payload_col)))
