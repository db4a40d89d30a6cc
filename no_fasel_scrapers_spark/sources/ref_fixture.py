"""Fixture pages synthesized from the reference's REAL output records.

The synthetic fixture (sources/fixture.py) derives everything from item
indices, so it can only exercise the edge cases its author thought of.
This module goes the other way (VERDICT r1 missing #1 / next-steps #4): it
takes records straight from ``/root/reference/output/*.json`` — actual
Arabic titles, year-suffixed titles, real genre casings, md5-ish iframe
sources — and reconstructs, per record, the page bytes the reference's
selectors would have been looking at.  Running the full crawl → extract →
assemble path over those pages must reproduce each stored record
byte-for-byte (field-wise), which pins the cleanup semantics
(``Common.py:163-165`` remove_arabic_chars, ``257-264`` remove_year,
``360-364`` clean_iframe_source, ``FaselAnimeScraper.py:26-28``) against
real-world data rather than generator output.

Reconstruction is *verified at build time*: a raw form (e.g. a decorated
title) is only emitted if the plain-Python reference-semantics oracle maps
it back to the stored value exactly; records for which no faithful raw
form exists (e.g. a fasel title that itself ends in four digits AND
contains its own year-suffix string) are skipped and counted, never
silently mangled.  Image Sources resolve through the image-cache path the
reference itself uses (``Common.py:223-225``: IMAGE_SOURCES hit wins), so
stored imgur/imgpile URLs round-trip exactly.

Fields not produced by the current reference scrapers (legacy "Rating" on
movies.json rows, "Genres" on anime.json rows) are excluded from the
expectation — the reference's own current code would not reproduce them
either.
"""

from __future__ import annotations

import json

from .fixture import (
    EPOCH,
    H,
    dhash,
    o_clean_anime_title,
    o_clean_iframe,
    o_clean_title,
    o_remove_arabic,
    _slug,
)
from ..functions.canonical_py import canonicalize_url

FASEL_HOST = "www.faselhd.vip"   # Common.py:28 FASEL_BASE_URL
AKWAM_HOST = "akwam.to"          # host embedded in arabic-movies Sources
WECIMA_HOST = "wecima.tube"      # WeCimaScraper.py source-prefix host
CIMANOW_HOST = "cimanow.cc"      # CimaNowMovieScraper.py:60


def _title_raw_forms(title: str):
    """Candidate raw div.h1 texts whose reference cleanup yields ``title``."""
    return [
        title,
        f"{title} 2021",
        f"عرض {title} مترجم",
        f"  {title}  ",
    ]


def _pick_raw_title(title: str) -> str | None:
    for raw in _title_raw_forms(title):
        if o_clean_title(raw) == title:
            return raw
    return None


def _iframe_for(source: str) -> str | None:
    """A raw iframe src whose clean_iframe_source yields ``source``."""
    if source == "":
        return "https://player.test/opaque"  # <3 '=' tokens → ""
    src = f"https://player.{FASEL_HOST}/e?a=b&s={source}&img=pp"
    return src if o_clean_iframe(src) == source else None


class RefRecordFixture:
    """pages/seeds/robots + expectations built from real reference records."""

    def __init__(self):
        self.pages: list[dict] = []
        self.seeds: list[dict] = []
        self.robots_hosts: set[str] = set()
        self.image_cache: dict[str, str] = {}
        self.tmdb_lookup: dict[str, tuple[str, int]] = {}  # title → (kind, id)
        self.translations: list[dict] = []
        self.expected: dict[str, list[dict]] = {}
        self.skipped: dict[str, int] = {}

    # -- plumbing ----------------------------------------------------------
    def _add_page(self, url: str, built: tuple[str, str]) -> None:
        markup, text = built
        canon = canonicalize_url(url)
        if not hasattr(self, "_urls"):
            self._urls = {}
        prev = self._urls.get(canon)
        if prev is not None:
            # listing roots legitimately mirror page 1; anything else
            # colliding would silently cross-contaminate two records
            assert prev == markup, f"conflicting page bytes for {canon}"
            return
        self._urls[canon] = markup
        self.pages.append({
            "url": canon,
            "warc_offset": dhash(url) % 1_000_000,
            "html": markup.encode("utf-8"),
            "text": text,
        })

    def _skip(self, family: str) -> None:
        self.skipped[family] = self.skipped.get(family, 0) + 1

    def _seed(self, url: str, site: str, category: str, template: str) -> None:
        self.seeds.append({
            "url": url, "site": site, "category": category,
            "priority": 0, "depth": 0, "role": "listing",
            "url_template": template,
        })

    def _tmdb(self, title: str, category: str, tmdb_id) -> None:
        if tmdb_id is None:
            return
        kind = "movies" if "movies" in category else "tv"
        prev = self.tmdb_lookup.get(title)
        if prev is not None and prev != (kind, tmdb_id):
            return  # conflicting ids for one title — keep the first
        self.tmdb_lookup[title] = (kind, tmdb_id)

    # -- fasel movies (movies.json) ---------------------------------------
    def add_fasel_movies(self, records: dict[str, dict]) -> None:
        host = FASEL_HOST
        cards = []
        exp = self.expected.setdefault("fasel_movies", [])
        for key, rec in records.items():
            title = rec["Title"]
            raw_title = _pick_raw_title(title)
            src = _iframe_for(rec.get("Source", ""))
            genres = rec.get("Genres") or []
            genres_ok = all(
                g and "/" not in g and g.lower().capitalize() == g
                for g in genres
            )
            fmt = rec.get("Format", "N/A")
            if raw_title is None or src is None or not genres_ok \
                    or not (isinstance(fmt, str) and fmt.isascii()):
                self._skip("fasel_movies")
                continue
            detail = f"https://{host}/movies/{key}-{_slug(title, 0)}"
            img_raw = f"https://{host}/uploads/{key}.jpg"
            self.image_cache[f"{key}-fasel"] = rec["Image Source"]
            self._tmdb(title, "movies", rec.get("TMDb ID"))

            def card(h: H, detail=detail, raw_title=raw_title, img_raw=img_raw):
                h.open("div", class_="col-xl-2 col-lg-2 col-md-3 col-sm-3")
                h.open("a", href=detail)
                h.leaf("div", raw_title, class_="h1")
                h.close("a")
                h.leaf("img", None, data_src=img_raw)
                h.close("div")
            cards.append(card)

            h = H()
            h.open("span")
            h.leaf("i", None, class_="fas fa-dot-circle")
            h.text(f" رقم : #{key} ")
            h.close("span")
            if fmt != "N/A":
                h.open("div", class_="fmt")
                h.leaf("i", None, class_="fas fa-play-circle")
                h.leaf("span", fmt)
                h.close("div")
            h.open("div", class_="genres")
            h.leaf("i", None, class_="far fa-folders")
            for g in genres:
                h.leaf("a", g, href=f"https://{host}/genre/{g.lower()}")
            h.close("div")
            h.leaf("iframe", None, src=src)
            self._add_page(detail, h.page())

            exp.append({
                "item_id": key, "title": title, "fmt": fmt,
                "genres": genres, "image_source": rec["Image Source"],
                "source": rec.get("Source", ""),
                "tmdb_id": rec.get("TMDb ID"),
            })
        self._emit_fasel_listing(host, "movies", "movies", cards)

    def _emit_fasel_listing(self, host, path, category, cards) -> None:
        h = H()
        h.leaf("h3", "Page 1")
        for c in cards:
            c(h)
        h.leaf("a", "»", href=f"https://{host}/{path}/page/1")
        built = h.page()
        self._add_page(f"https://{host}/{path}", built)
        self._add_page(f"https://{host}/{path}/page/1", built)
        self._seed(
            f"https://{host}/{path}", "fasel", category,
            f"https://{host}/{path}/page/{{p}}",
        )
        self.robots_hosts.add(host)

    # -- fasel anime (anime.json) -----------------------------------------
    def add_fasel_anime(self, records: dict[str, dict]) -> None:
        host = FASEL_HOST
        cards = []
        exp = self.expected.setdefault("fasel_anime", [])
        for key, rec in records.items():
            title = rec["Title"]
            eps = rec.get("Episodes") or {}
            fmt = rec.get("Format", "N/A")
            en = next(
                (c for c in (title, f"{title} Anime", f" {title} ")
                 if o_clean_anime_title(c) == title),
                None,
            )
            nums_ok = all(
                isinstance(v.get("Episode Number"), int)
                and isinstance(v.get("Source"), str)
                for v in eps.values()
            )
            if (
                en is None
                or not eps
                or rec.get("Number Of Episodes") != len(eps)
                or not nums_ok
                or not (isinstance(fmt, str) and fmt.isascii())
            ):
                self._skip("fasel_anime")
                continue
            raw_title = f"انمي {key}"
            self.translations.append({"ar_title": raw_title, "en_title": en})
            detail = f"https://{host}/anime/{key}-{_slug(title, 0)}"
            img_raw = f"https://{host}/uploads/{key}.jpg"
            self.image_cache[f"{key}-fasel"] = rec["Image Source"]

            def card(h: H, detail=detail, raw_title=raw_title, img_raw=img_raw):
                h.open("div", class_="col-xl-2 col-lg-2 col-md-3 col-sm-3")
                h.open("a", href=detail)
                h.leaf("div", raw_title, class_="h1")
                h.close("a")
                h.leaf("img", None, data_src=img_raw)
                h.close("div")
            cards.append(card)

            ordered = sorted(eps.items(), key=lambda kv: kv[1]["Episode Number"])
            h = H()
            h.open("span")
            h.leaf("i", None, class_="fas fa-dot-circle")
            h.text(f" رقم : #{key} ")
            h.close("span")
            if fmt != "N/A":
                h.open("div", class_="fmt")
                h.leaf("i", None, class_="fas fa-play-circle")
                h.leaf("span", fmt)
                h.close("div")
            h.open("div", class_="epAll")
            for eid, ep in ordered:
                h.leaf(
                    "a", f" الحلقة {ep['Episode Number']} ",
                    href=f"https://{host}/anime-ep/{eid}",
                )
            h.close("div")
            self._add_page(detail, h.page())

            for eid, ep in ordered:
                eh = H()
                eh.open("span")
                eh.leaf("i", None, class_="fas fa-dot-circle")
                eh.text(f" رقم : #{eid} ")
                eh.close("span")
                eh.leaf("iframe", None, src=ep["Source"])  # RAW, by design
                self._add_page(f"https://{host}/anime-ep/{eid}", eh.page())

            exp.append({
                "series_id": key, "title": title, "fmt": fmt,
                "image_source": rec["Image Source"],
                "episodes_total": len(eps),
                "episodes": eps,
            })
        self._emit_fasel_listing(host, "anime", "anime", cards)

    # -- fasel series (asian-series.json / tvshows.json) -------------------
    def add_fasel_series(self, records: dict[str, dict], family: str) -> None:
        host = FASEL_HOST
        cards = []
        exp = self.expected.setdefault(family, [])
        for key, rec in records.items():
            title = rec["Title"]
            raw_title = _pick_raw_title(title)
            seasons = rec.get("Seasons") or {}
            fmt = rec.get("Format", "N/A")
            ok = raw_title is not None and seasons \
                and isinstance(fmt, str) and fmt.isascii()
            plan = []
            for sid, s in sorted(
                seasons.items(), key=lambda kv: kv[1].get("Season Number") or 0
            ):
                eps = s.get("Episodes") or {}
                ordered = sorted(
                    eps.items(), key=lambda kv: kv[1]["Episode Number"]
                )
                nums = [e["Episode Number"] for _, e in ordered]
                if (
                    not isinstance(s.get("Season Number"), int)
                    or s.get("Number Of Episodes") != len(eps)
                    or nums != list(range(1, len(eps) + 1))
                    or len({eid for eid, _ in ordered}) != len(ordered)
                ):
                    ok = False
                    break
                srcs = [_iframe_for(e.get("Source", "")) for _, e in ordered]
                if any(v is None for v in srcs):
                    ok = False
                    break
                plan.append((sid, s["Season Number"], ordered, srcs))
            if not ok:
                self._skip(family)
                continue

            detail = f"https://{host}/series/{key}-{_slug(title, 0)}"
            img_raw = f"https://{host}/uploads/{key}.jpg"
            self.image_cache[f"{key}-fasel"] = rec["Image Source"]
            self._tmdb(title, family, rec.get("TMDb ID"))

            def card(h: H, detail=detail, raw_title=raw_title, img_raw=img_raw):
                h.open("div", class_="col-xl-2 col-lg-2 col-md-3 col-sm-3")
                h.open("a", href=detail)
                h.leaf("div", raw_title, class_="h1")
                h.close("a")
                h.leaf("img", None, data_src=img_raw)
                h.close("div")
            cards.append(card)

            h = H()
            h.open("span")
            h.leaf("i", None, class_="fas fa-dot-circle")
            h.text(f" رقم : #{key} ")
            h.close("span")
            if fmt != "N/A":
                h.open("div", class_="fmt")
                h.leaf("i", None, class_="fas fa-play-circle")
                h.leaf("span", fmt)
                h.close("div")
            for sid, snum, _ordered, _srcs in plan:
                h.open("div", class_="col-xl-2 col-lg-3 col-md-6")
                h.open("div", data_href=sid)
                h.leaf("div", f"موسم {snum}", class_="title")
                h.close("div")
                h.close("div")
            self._add_page(detail, h.page())

            for sid, _snum, ordered, srcs in plan:
                sh = H()
                sh.leaf("h2", f"Season {sid}")
                sh.open("div", class_="epAll")
                for (eid, _ep) in ordered:
                    sh.leaf(
                        "a", f"Episode {eid}",
                        href=f"https://{host}/episodes/{eid}",
                    )
                sh.close("div")
                self._add_page(f"https://{host}/?p={sid}", sh.page())
                for (eid, _ep), src in zip(ordered, srcs):
                    eh = H()
                    eh.leaf("span", f"watch?sh={eid}", id="liskSh")
                    eh.leaf("iframe", None, src=src)
                    self._add_page(f"https://{host}/episodes/{eid}", eh.page())

            exp.append({
                "series_id": key, "title": title, "fmt": fmt,
                "image_source": rec["Image Source"],
                "episodes_total": sum(len(o) for _, _, o, _ in plan),
                "seasons": {
                    sid: {
                        "Season Number": snum,
                        "Number Of Episodes": len(ordered),
                        "Episodes": {eid: dict(ep) for eid, ep in ordered},
                    }
                    for sid, snum, ordered, _ in plan
                },
            })
        self._emit_fasel_listing(host, f"x-{family}", family, cards)

    # -- akwam arabic movies (arabic-movies.json) --------------------------
    def add_akwam_movies(self, records: dict[str, dict]) -> None:
        host = AKWAM_HOST
        cards = []
        exp = self.expected.setdefault("akwam_movies", [])
        rev_genres = {}
        from ..functions.decode_tables import AKWAM_GENRES

        for gid, name in AKWAM_GENRES.items():
            rev_genres.setdefault(name, gid)
        for key, rec in records.items():
            title = rec["Title"]
            source = rec.get("Source", "")
            parts = source.split("/")
            genres = rec.get("Genres") or []
            if (
                title.strip() != title
                or len(parts) != 6
                or parts[3] != "watch"
                or parts[5] != key
                or parts[2] != host
                or any(g not in rev_genres for g in genres)
            ):
                self._skip("akwam_movies")
                continue
            short_id = parts[4]
            detail = f"https://{host}/movie/{key}/{_slug(title, 0)}"
            image_href = f"https://{host}/posters/{key}.jpg"
            self.image_cache[f"{key}-akwam-movies"] = rec["Image Source"]
            self._tmdb(title, "arabic-movies", rec.get("TMDb ID"))

            def card(h: H, detail=detail):
                h.open("a", class_="icn play", href=detail)
                h.text("مشاهدة")
                h.close("a")
            cards.append(card)

            h = H()
            h.leaf(
                "h1", f"  {title}  ",
                class_="entry-title font-size-28 font-weight-bold "
                       "text-white mb-0",
            )
            h.open(
                "div",
                class_="col-lg-3 col-md-4 text-center mb-5 mb-md-0",
            )
            h.leaf("a", "poster", href=image_href)
            h.close("div")
            for g in genres:
                h.leaf(
                    "a", g,
                    class_="badge badge-pill badge-light ml-2",
                    href=f"https://{host}/genre?id={rev_genres[g]}",
                )
            h.open(
                "a",
                class_="link-btn link-show d-flex align-items-center px-3",
                href=f"https://{host}/link/{short_id}",
            )
            h.text("الذهاب للمشاهدة")
            h.close("a")
            self._add_page(detail, h.page())

            exp.append({
                "item_id": key, "title": title, "genres": genres,
                "image_source": rec["Image Source"], "source": source,
                "tmdb_id": rec.get("TMDb ID"),
            })

        h = H()
        h.leaf("h3", "Page 1")
        for c in cards:
            c(h)
        for label in ("1", "1", "next", "last"):
            h.leaf("a", label, class_="page-link", href="#")
        built = h.page()
        root = f"https://{host}/movies?section=0&language=1"
        self._add_page(root, built)
        self._add_page(root + "&page=1", built)
        self._seed(root, "akwam", "arabic-movies", root + "&page={p}")
        self.robots_hosts.add(host)

    # -- wecima series (WeCima.json) ---------------------------------------
    def add_wecima(self, records: dict[str, dict]) -> None:
        """WeCima.json — the record shape with STRING season numbers
        (``WeCimaScraper.py:37`` remove_arabic_chars of the anchor title)
        and url-encoded Source slugs stripped from the hardcoded
        ``https://wecima.tube/series/`` prefix (line 34-35)."""
        host = WECIMA_HOST
        cards = []
        exp = self.expected.setdefault("wecima", [])
        for key, rec in records.items():
            title = rec["Title"]
            season = rec.get("Season Number")
            source = rec.get("Source", "")
            image = rec.get("Image Source", "")
            # raw anchor-title whose remove_arabic_chars yields the stored
            # season string; raw strong text whose split('-')[0].strip()
            # yields the stored title
            raw_season = next(
                (c for c in (f"موسم {season}", season, f" {season} ")
                 if isinstance(season, str) and o_remove_arabic(c) == season),
                None,
            )
            raw_strong = next(
                (c for c in (f"{title} - 2023", title, f"  {title}  ")
                 if c.split("-")[0].strip() == title),
                None,
            )
            href = f"https://{host}/series/{source}"
            img_style = f"--image:url({image});"
            ok = (
                raw_season is not None
                and raw_strong is not None
                and isinstance(source, str)
                and source != ""
                # the extractor's global replaces must round-trip exactly
                and href.replace(f"https://{host}/series/", "") == source
                and img_style.replace("--image:url(", "").replace(");", "")
                == image
            )
            if not ok:
                self._skip("wecima")
                continue

            def card(h: H, key=key, href=href, raw_season=raw_season,
                     raw_strong=raw_strong, img_style=img_style):
                h.open("div", class_="GridItem", cpd=key)
                h.open("a", href=href, title=raw_season)
                h.leaf("strong", raw_strong, class_="hasyear")
                h.leaf("span", None, class_="BG--GridItem",
                       data_lazy_style=img_style)
                h.close("a")
                h.close("div")
            cards.append(card)

            exp.append({
                "item_id": key, "title": title, "image_source": image,
                "source": source, "season_number": season,
            })

        h = H()
        for c in cards:
            c(h)
        # ul.page-numbers, li[-2] = last page (WeCimaScraper.py:10-14)
        h.open("ul", class_="page-numbers")
        h.leaf("li", "1")
        h.leaf("li", "1")
        h.leaf("li", "next")
        h.close("ul")
        built = h.page()
        root = f"https://{host}/download-series/"
        self._add_page(root, built)
        self._add_page(root + "?page_number=1/", built)
        self._seed(root, "wecima", "wecima", root + "?page_number={p}/")
        self.robots_hosts.add(host)

    # -- cimanow movies (CimaNowMovies.json) -------------------------------
    def add_cimanow_movies(self, records: dict[str, dict]) -> None:
        """CimaNowMovies.json — the record shape with multi-quality
        ``list[map]`` Sources (``Common.py:392-394``: ul#download anchors →
        [{quality: href}]) and genre decode through CIMA_NOW_GENRES
        (``CimaNowMovieScraper.py:52``).  The reference's item id is the
        irreproducible ``str(hash(title))[1:7]`` (line 54) — the engine's
        documented O25 replacement is ``md5(title)[:6]``, so expectations
        key on title."""
        from ..functions.decode_tables import CIMA_NOW_GENRES

        host = CIMANOW_HOST
        cards = []
        exp = self.expected.setdefault("cimanow_movies", [])
        rev: dict[str, str] = {}
        for ar, en in CIMA_NOW_GENRES.items():
            rev.setdefault(en, ar)
        seen_titles: set[str] = set()
        for key, rec in records.items():
            title = rec["Title"]
            genres = rec.get("Genres") or []
            sources = rec.get("Sources") or []
            image = rec.get("Image Source", "")
            raw_genres = " ، ".join(rev.get(g, "") for g in genres)
            li_text = f"{title} {raw_genres}"
            sources_ok = all(
                isinstance(s, dict) and len(s) == 1
                and all(
                    isinstance(q, str) and q and " " not in q
                    and isinstance(u, str) and u
                    for q, u in s.items()
                )
                for s in sources
            )
            ok = (
                title not in seen_titles
                and all(g in rev for g in genres)
                # reference title recovery: li.text.replace(raw_genres,
                # '').strip() must round-trip (fails if the title itself
                # contains the genre string)
                and li_text.replace(raw_genres, "").strip() == title
                and [CIMA_NOW_GENRES.get(g) for g in raw_genres.split(" ، ")]
                == genres
                and sources_ok
                and sources
            )
            if not ok:
                self._skip("cimanow_movies")
                continue
            seen_titles.add(title)
            slug = f"cn-{key}"
            watch = f"https://{host}/{slug}/watching"
            self._tmdb(title, "movies", rec.get("TMDb ID"))

            def card(h: H, slug=slug, title=title, raw_genres=raw_genres,
                     image=image):
                h.open("article")
                h.open("a", href=f"https://{host}/{slug}/")
                h.leaf("img", None, src=image)
                h.close("a")
                h.open("ul")
                h.leaf("li", "badge")
                h.open("li")
                h.text(f"{title} ")
                h.leaf("em", raw_genres)
                h.close("li")
                h.close("ul")
                h.close("article")
            cards.append(card)

            wh = H()
            wh.open("ul", id="download")
            wh.open("li")
            for s in sources:
                (quality, url_), = s.items()
                wh.leaf("a", f"{quality} تحميل", href=url_)
            wh.close("li")
            wh.close("ul")
            self._add_page(watch, wh.page())

            # expected id mirrors the shared lookup (first registration
            # wins on a cross-family title conflict, like the reference's
            # per-title TMDb cache)
            reg = self.tmdb_lookup.get(title)
            exp.append({
                "title": title, "genres": genres, "image_source": image,
                "sources": sources,
                "tmdb_id": reg[1] if reg and reg[0] == "movies" else None,
            })

        route = "arabic-movies"
        h = H()
        h.open("section")
        for c in cards:
            c(h)
        h.close("section")
        # last ul's last li = last page (Common.py:388-389)
        h.open("ul", class_="pagination")
        h.leaf("li", "1")
        h.close("ul")
        built = h.page()
        root = f"https://{host}/category/{route}"
        self._add_page(root, built)
        self._add_page(root + "/page/1", built)
        self._seed(root, "cimanow", "cimanow-movie", root + "/page/{p}")
        self.robots_hosts.add(host)

    # -- Spark loaders -----------------------------------------------------
    def pages_df(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [
                (p["url"], p["warc_offset"], p["html"], p["text"])
                for p in self.pages
            ],
            "url string, warc_offset long, html binary, text string",
        )
        return df.withColumn(
            "warc_ts",
            F.to_timestamp(F.lit(EPOCH))
            + F.make_interval(secs=F.col("warc_offset")),
        ).withColumn("lang", F.lit(None).cast("string")).drop("warc_offset")

    def seeds_df(self, spark):
        return spark.createDataFrame(
            [
                (s["url"], s["site"], s["category"], s["priority"],
                 s["depth"], s["role"], s["url_template"])
                for s in self.seeds
            ],
            "url string, site string, category string, priority int, "
            "depth int, role string, url_template string",
        )

    def robots_df(self, spark):
        return spark.createDataFrame(
            [(h, [], 0) for h in sorted(self.robots_hosts)],
            "host string, disallow_prefixes array<string>, crawl_delay_ms int",
        )

    def image_cache_df(self, spark):
        return spark.createDataFrame(
            list(self.image_cache.items()) or [("", "")],
            "content_id string, image_url string",
        )

    def tmdb_df(self, spark):
        rows = sorted(
            (t, k, i) for t, (k, i) in self.tmdb_lookup.items()
        )
        return spark.createDataFrame(
            rows or [("", "", 0)], "title string, kind string, tmdb_id long"
        )

    def translations_df(self, spark):
        return spark.createDataFrame(
            [(t["ar_title"], t["en_title"]) for t in self.translations]
            or [("", "")],
            "ar_title string, en_title string",
        )

    def expected_texts(self) -> dict[str, str]:
        return {p["url"]: p["text"] for p in self.pages}
