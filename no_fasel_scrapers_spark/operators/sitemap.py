"""Sitemap parsing as pure Spark columns — crawl discovery's other channel.

``parse_sitemaps`` turns raw sitemap XML bodies into frontier-ready URL
rows.  Handles both document kinds from the sitemaps.org protocol:

- ``<urlset>``   → one row per ``<url>`` entry: loc + optional lastmod /
  priority, ``kind='url'``;
- ``<sitemapindex>`` → one row per nested ``<sitemap>`` loc with
  ``kind='sitemap'`` — the caller feeds those back as frontier rows of a
  sitemap-fetching role, so index recursion is just another crawl wave
  (no driver-side loop).

Entry splitting is ``explode(split(...))`` on the entry open tag and field
extraction is ``regexp_extract`` per fragment — no XML library, no UDF, no
shuffle (narrow map end to end).  CDATA-free well-formed sitemaps (the
overwhelming real-world case) parse exactly; pathological XML degrades to
dropped fragments, never wrong pairings, because loc/lastmod are extracted
from the SAME fragment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOC = r"(?s)<loc>\s*([^<]+?)\s*</loc>"
_LASTMOD = r"(?s)<lastmod>\s*([^<]+?)\s*</lastmod>"
_PRIORITY = r"(?s)<priority>\s*([^<]+?)\s*</priority>"


def parse_sitemaps(bodies: DataFrame) -> DataFrame:
    """(host, sitemap_xml) → (host, kind, url, lastmod, priority).

    ``kind`` is 'url' for urlset entries and 'sitemap' for nested index
    entries; ``lastmod`` stays a raw string (W3C datetime variants differ —
    canonicalize downstream), ``priority`` is a double (null when absent).
    Fragments without a <loc> are dropped.
    """
    def entries(tag: str, kind: str):
        frag = F.posexplode(
            F.split(F.col("sitemap_xml"), f"<{tag}>")
        )
        df = bodies.select("host", frag.alias("i", "frag")).filter(
            F.col("i") > 0  # text before the first entry is preamble
        )
        return df.select(
            "host",
            F.lit(kind).alias("kind"),
            F.regexp_extract(F.col("frag"), _LOC, 1).alias("url"),
            F.nullif(
                F.regexp_extract(F.col("frag"), _LASTMOD, 1), F.lit("")
            ).alias("lastmod"),
            F.nullif(
                F.regexp_extract(F.col("frag"), _PRIORITY, 1), F.lit("")
            )
            .cast("double")
            .alias("priority"),
        ).filter(F.col("url") != "")

    urls = entries("url", "url")
    nested = entries("sitemap", "sitemap")
    return urls.unionByName(nested)
