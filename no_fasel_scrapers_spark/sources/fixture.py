"""Deterministic synthetic crawl fixture — pages + seeds + robots + goldens.

Generates a coherent mini-web for five synthetic sites whose HTML matches
the reference's selector families exactly (FIXTURES.md), so the real
extractors run against it.  Everything derives from item indices via FNV
hashing — zero randomness, zero wall-clock — so any two runs (and any two
parallelism levels) see identical bytes.

Outputs:
- ``pages``         rows ``(url, warc_ts, html, text, lang)`` — url is the
                    *canonical* form (pages table is the offline fetch
                    universe, keyed like the frontier).  ``text`` is the
                    expected canonical extracted text, assembled from the
                    template pieces independently of any HTML parser.
- ``seeds``         listing roots per site/category with URL templates for
                    pagination expansion.
- ``robots``        per-host disallow prefixes + crawl delay.
- ``golden_flat``   expected flat content records (movies-style), computed
                    by a plain-Python oracle that mirrors the reference's
                    cleanup semantics (Common.py:163-165,257-264,360-364…)
                    — independent of the Spark column implementations.
- ``golden_series`` expected nested records (seasons/episodes JSON).
- ``image_cache`` / ``tmdb_lookup`` deterministic enrichment stand-ins.
- ``seen_prior``    previous-run URL-seen rows for incremental tests.

Scale: ``FixtureConfig.scale(k)`` multiplies item counts; generation is
slice-able by item index (``site_rows(site, lo, hi)``) so the bench builds
the table distributed via ``spark.range(...).mapInPandas``.
"""

from __future__ import annotations

import html as _htmlmod
import json
from dataclasses import dataclass, field
from hashlib import md5

from ..functions.canonical_py import canonicalize_url
from ..functions.decode_tables import (
    AKWAM_GENRES,
    CIMA_NOW_GENRES,
    PLACEHOLDER_IMAGE,
)

EPOCH = "2023-01-01 00:00:00"  # warc_ts base; offset per page in seconds

_FNV64 = (1 << 64) - 1


def dhash(*parts) -> int:
    """Deterministic 64-bit FNV-1a over the stringified parts."""
    h = 1469598103934665603
    for p in parts:
        for b in str(p).encode():
            h = ((h ^ b) * 1099511628211) & _FNV64
    return h


# ---------------------------------------------------------------------------
# HTML assembly that tracks expected text
# ---------------------------------------------------------------------------

class H:
    """Accumulates markup + the expected canonical text of the page.

    Canonical text contract (functions/extract.py:page_text): each text
    node stripped, empties dropped, joined with '\\n'.  The builder records
    text at emit time, so the expectation never goes through an HTML parser.
    """

    def __init__(self):
        self.markup: list[str] = []
        self.texts: list[str] = []

    def open(self, tag: str, **attrs) -> "H":
        a = "".join(
            f' {k.rstrip("_").replace("_", "-")}="{_htmlmod.escape(str(v), quote=True)}"'
            for k, v in attrs.items()
            if v is not None
        )
        self.markup.append(f"<{tag}{a}>")
        return self

    def close(self, tag: str) -> "H":
        self.markup.append(f"</{tag}>")
        return self

    def text(self, s: str) -> "H":
        self.markup.append(_htmlmod.escape(s, quote=False))
        t = s.strip()
        if t:
            self.texts.append(t)
        return self

    def leaf(self, tag: str, text: str | None = None, **attrs) -> "H":
        self.open(tag, **attrs)
        if text is not None:
            self.text(text)
        self.close(tag)
        return self

    def page(self) -> tuple[str, str]:
        body = "".join(self.markup)
        return f"<html><body>{body}</body></html>", "\n".join(self.texts)


# ---------------------------------------------------------------------------
# Reference-semantics oracle (plain Python, independent of Spark columns)
# ---------------------------------------------------------------------------

def o_remove_arabic(s: str) -> str:
    return s.encode("ascii", "ignore").decode().strip()


def o_remove_year(t: str) -> str:
    if t[-4:].isdigit() and len(t) > 4:
        t = t.replace(t[-5:], "")
    return t


def o_clean_title(t: str) -> str:
    return o_remove_year(o_remove_arabic(t))


def o_clean_iframe(src: str) -> str:
    try:
        return src.split("=")[2].replace("&img", "")
    except IndexError:
        return ""


def o_clean_anime_title(translated: str) -> str:
    """FaselAnimeScraper.py:26-28 — note strip() runs BEFORE the ascii
    drop, so whitespace uncovered by removing non-ASCII chars survives."""
    return (
        translated.replace("Anime", "").replace("anime", "").replace("?", "")
        .strip().encode("ascii", "ignore").decode()
    )


def resolve_image(content_id: str, image_url: str, cache: dict[str, str]) -> str:
    """Deterministic O15: cache hit -> cached URL; empty -> placeholder;
    else deterministic upload stand-in (Common.py:217-254 minus Imgur)."""
    if content_id in cache:
        return cache[content_id]
    if image_url == "":
        return PLACEHOLDER_IMAGE
    return f"https://i.upload.test/{content_id}.jpg"


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclass
class FixtureConfig:
    items: dict[str, int] = field(
        default_factory=lambda: {
            "fasel_movies": 30,
            "fasel_series": 12,
            "fasel_anime": 10,
            "akwam_movies": 18,
            "akwam_series": 8,
            "hdw": 24,
            "wecima": 24,
            "cimanow": 18,
        }
    )
    items_per_page: int = 12

    def scale(self, k: float) -> "FixtureConfig":
        return FixtureConfig(
            items={n: max(1, int(v * k)) for n, v in self.items.items()},
            items_per_page=self.items_per_page,
        )


GENRE_SLUGS = ["action", "drama", "comedy", "horror", "sci-fi"]
AKWAM_GENRE_IDS = sorted(AKWAM_GENRES)  # deterministic order
CIMA_GENRES_AR = [g for g in CIMA_NOW_GENRES]


def raw_title(tag: str, i: int) -> str:
    base = f"Alpha{i} Show{i % 13} {tag}"
    v = i % 8
    if v == 1:
        return f"عرض {base} فيلم"
    if v == 2:
        return f"{base} 2021"
    if v == 3:
        return f"T{i % 9}"
    if v == 4:
        return f"{base} 2020 X 2020"
    if v == 5:
        return "2020"
    if v == 6:
        return f"  {base}  "
    if v == 7:
        return "عنوان عربي"
    return base


def _slug(s: str, i: int) -> str:
    a = "".join(c if c.isalnum() else "-" for c in o_remove_arabic(s).lower())
    a = "-".join(p for p in a.split("-") if p)
    return a or f"item-{i}"


def fasel_genres(i: int) -> list[str]:
    n = i % 4
    return [GENRE_SLUGS[(i + k) % len(GENRE_SLUGS)] for k in range(n)]


def fasel_format(i: int) -> str | None:
    v = i % 3
    if v == 0:
        return "1080p BluRay"
    if v == 1:
        return None  # element absent -> N/A
    return "جودة عالية"  # non-ascii -> N/A


def fasel_iframe(i: int) -> str:
    v = i % 7
    if v == 5:
        return "no-equals-here"  # 1 token -> Source ""
    if v == 6:
        return f"https://p.fasel.test/e?x={i}"  # 2 tokens -> Source ""
    if v % 2 == 0:
        return f"https://p.fasel.test/e?a=b&src=STR{i}"
    return f"https://p.fasel.test/e?a=b&src=STR{i}&img=pp"


def fasel_image(i: int, item_id: str) -> str:
    return "" if i % 5 == 4 else f"https://img.fasel.test/{item_id}.webp"


# ---------------------------------------------------------------------------
# The fixture
# ---------------------------------------------------------------------------

def fasel_detail_common(h: H, item_id: str, fmt: str | None, genres) -> None:
    """Shared fasel detail-page body (id marker, format, genres) — also used
    by the distributed bench generator (sources/pagegen.py)."""
    h.open("div", class_="meta")
    h.open("span")
    h.leaf("i", None, class_="fas fa-dot-circle")
    h.text(f" رقم : #{item_id} ")
    h.close("span")
    h.close("div")
    if fmt is not None:
        h.open("div", class_="fmt")
        h.leaf("i", None, class_="fas fa-play-circle")
        h.leaf("span", fmt)
        h.close("div")
    h.open("div", class_="genres")
    h.leaf("i", None, class_="far fa-folders")
    for g in genres:
        h.leaf("a", g.capitalize(), href=f"https://fasel.test/genre/{g}")
    h.close("div")


class Fixture:
    """All generated rows, as plain dict lists (wrap with spark.createDataFrame)."""

    def __init__(self, cfg: FixtureConfig | None = None):
        self.cfg = cfg or FixtureConfig()
        self.pages: list[dict] = []
        self.seeds: list[dict] = []
        self.robots: list[dict] = []
        self.golden_flat: list[dict] = []
        self.golden_series: list[dict] = []
        self.golden_anime: list[dict] = []
        self.image_cache: dict[str, str] = {}
        self.tmdb_lookup: list[dict] = []
        self.seen_prior: list[dict] = []
        self.translations: list[dict] = []
        self.anime_prior: list[dict] = []
        self._build()

    # -- helpers -----------------------------------------------------------
    def _add_page(self, url: str, html_text: tuple[str, str]) -> None:
        canon = canonicalize_url(url)
        markup, text = html_text
        payload = markup.encode("utf-8")
        # ~25% of pages ship windows-1256 with a meta declaration
        # (round 5): the real web's legacy-encoding share, INSIDE the
        # crawl loop, so crawl_e2e's value-pinned oracle checks the
        # charset sniffing ladder too.  Only markup that is losslessly
        # cp1256-encodable switches, so the extracted text is
        # byte-identical to the utf-8 twin by construction and the
        # table's text column stays truthful.
        if dhash("charset", canon) % 4 == 0:
            try:
                payload = (
                    '<meta charset="windows-1256">' + markup
                ).encode("cp1256", "strict")
            except UnicodeEncodeError:
                pass
        self.pages.append(
            {
                "url": canon,
                "warc_offset": dhash(canon) % 1_000_000,
                "html": payload,
                "text": text,
                "lang": "ar" if dhash("lang", canon) % 10 < 6 else "en",
            }
        )

    def _cache_image(self, content_id: str, i: int) -> None:
        if i % 3 != 0:
            self.image_cache[content_id] = f"https://i.imgcache.test/{content_id}.jpg"

    def _tmdb(self, title: str, kind: str) -> int | None:
        if dhash("tmdb", title) % 20 == 0:
            return None
        tid = dhash("tmdbid", title) % 100000
        self.tmdb_lookup.append({"title": title, "kind": kind, "tmdb_id": tid})
        return tid

    # -- listing scaffolding ------------------------------------------------
    def _listing_pages(
        self,
        page_url,            # (p:int) -> url
        root_url: str,
        cards,               # list of card-renderer callables (H -> None)
        pagination,          # (H, last_page:int) -> None
    ):
        per = self.cfg.items_per_page
        chunks = [cards[k : k + per] for k in range(0, len(cards), per)] or [[]]
        last = len(chunks)
        for p, chunk in enumerate(chunks, start=1):
            h = H()
            h.leaf("h3", f"Page {p}")
            for render in chunk:
                render(h)
            pagination(h, last)
            built = h.page()
            self._add_page(page_url(p), built)
            if p == 1 and root_url:
                self._add_page(root_url, built)
        return last

    # ======================================================================
    # FASEL
    # ======================================================================
    def _fasel_card(self, href: str, title: str, img: str):
        def render(h: H):
            h.open("div", class_="col-xl-2 col-lg-2 col-md-3 col-sm-3")
            h.open("a", href=href)
            h.leaf("div", title, class_="h1")
            h.close("a")
            h.leaf("img", None, data_src=img if img else "")
            h.close("div")
        return render

    def _fasel_detail_common(self, h: H, item_id: str, fmt: str | None, genres):
        fasel_detail_common(h, item_id, fmt, genres)

    def _build_fasel(self):
        host = "fasel.test"
        # ---- movies (flat) ----
        n = self.cfg.items["fasel_movies"]
        cards = []
        for i in range(n):
            item_id = str(7000 + i)
            title_raw = raw_title("F", i)
            private = i % 17 == 0
            pathseg = "private" if private else "movies"
            slug = _slug(title_raw, i)
            detail = f"https://{host}/{pathseg}/{item_id}-{slug}"
            # exercise canonicalization on a subset of discovered hrefs
            href = detail
            if i % 6 == 0:
                href = detail + "?utm_source=feed"
            elif i % 6 == 3:
                href = detail.replace(f"https://{host}", f"HTTPS://{host.upper()}")
            img = fasel_image(i, item_id)
            cards.append(self._fasel_card(href, title_raw, img))

            h = H()
            h.leaf("h2", title_raw)
            self._fasel_detail_common(h, item_id, fasel_format(i), fasel_genres(i))
            h.leaf("iframe", None, src=fasel_iframe(i))
            self._add_page(detail, h.page())

            content_key = item_id + "-fasel"
            self._cache_image(content_key, i)
            title = o_clean_title(title_raw)
            if not private:
                self.golden_flat.append({
                    "site": "fasel", "category": "movies", "item_id": item_id,
                    "title": title,
                    "fmt": fasel_format(i) if (fasel_format(i) or "").isascii() and fasel_format(i) else "N/A",
                    "genres": [g.capitalize() for g in fasel_genres(i)],
                    "image_source": resolve_image(content_key, img, self.image_cache),
                    "source": o_clean_iframe(fasel_iframe(i)),
                    "rating": None, "tmdb_id": self._tmdb(title, "movies"),
                    "sources_json": None, "season_number": None,
                })
            if i % 5 == 1:
                self.seen_prior.append({
                    "url": canonicalize_url(detail), "item_id": item_id,
                    "episode_count": None,
                })

        def fasel_pagination(h: H, last: int):
            h.open("ul", class_="pag")
            h.leaf("li", "1", class_="page-item")
            h.leaf("li", str(last), class_="page-item")
            h.close("ul")
            h.leaf("a", "»", href=f"https://{host}/movies/page/{last}")

        self._listing_pages(
            lambda p: f"https://{host}/movies/page/{p}",
            f"https://{host}/movies",
            cards,
            fasel_pagination,
        )
        self.seeds.append({
            "url": f"https://{host}/movies", "site": "fasel",
            "category": "movies", "priority": 0, "depth": 0, "role": "listing",
            "url_template": f"https://{host}/movies/page/{{p}}",
        })

        # ---- series (nested) ----
        n = self.cfg.items["fasel_series"]
        s_cards = []
        for i in range(n):
            series_id = str(9000 + i)
            title_raw = raw_title("S", i)
            slug = _slug(title_raw, i)
            detail = f"https://{host}/series/{series_id}-{slug}"
            img = fasel_image(i, series_id)
            s_cards.append(self._fasel_card(detail, title_raw, img))

            n_seasons = 1 + i % 3
            seasons_meta = []
            h = H()
            h.leaf("h2", title_raw)
            self._fasel_detail_common(h, series_id, fasel_format(i), fasel_genres(i))
            for s in range(1, n_seasons + 1):
                season_id = f"s{series_id}x{s}"
                seasons_meta.append((season_id, s))
                h.open("div", class_="col-xl-2 col-lg-3 col-md-6")
                h.open("div", data_href=season_id)
                h.leaf("div", f"موسم {s}", class_="title")
                h.close("div")
                h.close("div")
            self._add_page(detail, h.page())

            seasons_json: dict = {}
            total_eps = 0
            for season_id, s in seasons_meta:
                n_eps = 2 + (i + s) % 3
                ep_ids = [f"e{series_id}x{s}x{e}" for e in range(1, n_eps + 1)]
                sh = H()
                sh.leaf("h2", f"Season {s}")
                sh.open("div", class_="epAll")
                for eid in ep_ids:
                    sh.leaf("a", f"Episode {eid}", href=f"https://{host}/episodes/{eid}")
                sh.close("div")
                self._add_page(f"https://{host}/?p={season_id}", sh.page())

                eps_json = {}
                for k, eid in enumerate(ep_ids, start=1):
                    eh = H()
                    eh.leaf("span", f"watch?sh={eid}", id=eid and "liskSh")
                    eh.leaf("iframe", None, src=fasel_iframe(i + k))
                    self._add_page(f"https://{host}/episodes/{eid}", eh.page())
                    eps_json[eid] = {
                        "Episode Number": k,
                        "Source": o_clean_iframe(fasel_iframe(i + k)),
                    }
                total_eps += n_eps
                seasons_json[season_id] = {
                    "Season Number": s,
                    "Number Of Episodes": n_eps,
                    "Episodes": eps_json,
                }

            key = series_id + "-fasel"
            self._cache_image(key, i)
            title = o_clean_title(title_raw)
            self.golden_series.append({
                "site": "fasel", "category": "series", "series_id": series_id,
                "title": title,
                "fmt": fasel_format(i) if (fasel_format(i) or "").isascii() and fasel_format(i) else "N/A",
                "genres": [g.capitalize() for g in fasel_genres(i)],
                "image_source": resolve_image(key, img, self.image_cache),
                "episodes_total": total_eps,
                "seasons_json": json.dumps(seasons_json, sort_keys=True, separators=(",", ":")),
            })

        def fasel_series_pagination(h: H, last: int):
            h.leaf("a", "»", href=f"https://{host}/series/page/{last}")

        self._listing_pages(
            lambda p: f"https://{host}/series/page/{p}",
            f"https://{host}/series",
            s_cards,
            fasel_series_pagination,
        )
        self.seeds.append({
            "url": f"https://{host}/series", "site": "fasel",
            "category": "series", "priority": 0, "depth": 0, "role": "listing",
            "url_template": f"https://{host}/series/page/{{p}}",
        })
        self.robots.append({
            "host": host,
            "disallow_prefixes": ["/private/"],
            "crawl_delay_ms": dhash("delay", host) % 400,
        })

    # ======================================================================
    # FASEL ANIME (distinct family — FaselAnimeScraper.py)
    # ======================================================================
    def _build_fasel_anime(self):
        """The anime flow's structure differs from fasel-series on purpose
        (VERDICT r1 missing #4 / next-steps #7): div.epAll sits directly on
        the detail page (no seasons), episodes are keyed by their own
        page's content id, Episode Number comes from the anchor text, the
        Source is the RAW iframe src, and the title goes through the
        translation lookup + clean_anime_title."""
        host = "fasel.test"
        n = self.cfg.items["fasel_anime"]
        cards = []
        for i in range(n):
            anime_id = str(8000 + i)
            raw_title = f"انمي Zeta{i} قصة"
            # translation stand-in: decorated english exercising every
            # clean_anime_title branch; every 4th title has NO entry →
            # fallback = cleanup of the raw (Arabic dropped, the space
            # uncovered by the drop KEPT — strip runs before the drop)
            if i % 4 != 3:
                en = [
                    f"Zeta{i} Story Anime",
                    f" The Zeta{i} anime tale ",
                    f"Zeta{i}: who? what?",
                    f"Zeta{i} chronicle",
                ][i % 4]
                self.translations.append(
                    {"ar_title": raw_title, "en_title": en}
                )
                title = o_clean_anime_title(en)
            else:
                title = o_clean_anime_title(raw_title)
            slug = _slug(raw_title, i)
            detail = f"https://{host}/anime/{anime_id}-{slug}"
            img = fasel_image(i, anime_id)
            cards.append(self._fasel_card(detail, raw_title, img))

            n_eps = 2 + i % 4
            ep_ids = [str(80000 + 100 * i + k) for k in range(1, n_eps + 1)]
            h = H()
            h.leaf("h2", raw_title)
            self._fasel_detail_common(h, anime_id, fasel_format(i), [])
            h.open("div", class_="epAll")
            for k, eid in enumerate(ep_ids, start=1):
                h.leaf(
                    "a", f" الحلقة {k} ",
                    href=f"https://{host}/anime-ep/{eid}",
                )
            h.close("div")
            self._add_page(detail, h.page())

            eps_json = {}
            for k, eid in enumerate(ep_ids, start=1):
                src = f"https://p.fasel.test/anime?e={eid}&q=hd"
                eh = H()
                eh.open("span")
                eh.leaf("i", None, class_="fas fa-dot-circle")
                eh.text(f" رقم : #{eid} ")
                eh.close("span")
                missing_iframe = i % 5 == 2 and k == 1
                if not missing_iframe:
                    eh.leaf("iframe", None, src=src)
                self._add_page(f"https://{host}/anime-ep/{eid}", eh.page())
                if not missing_iframe:
                    # skipped from the map but still counted in the total
                    # (reference counts the anchor list, line 108)
                    eps_json[eid] = {"Episode Number": k, "Source": src}

            key = anime_id + "-fasel"
            self._cache_image(key, i)
            self.golden_anime.append({
                "site": "fasel", "category": "anime", "series_id": anime_id,
                "title": title,
                "fmt": fasel_format(i) if (fasel_format(i) or "").isascii() and fasel_format(i) else "N/A",
                "genres": [],
                "image_source": resolve_image(key, img, self.image_cache),
                "episodes_total": n_eps,
                "seasons_json": json.dumps(
                    eps_json, sort_keys=True, separators=(",", ":")
                ),
            })
            if i % 3 == 1:
                # prior-run record for the episode-delta flow
                # (FaselAnimeScraper.py:112-124): old count < current
                old_n = max(1, n_eps - 2)
                self.anime_prior.append({
                    "series_id": anime_id,
                    "old_count": old_n,
                    "old_eps_json": json.dumps(
                        {e: eps_json[e] for e in ep_ids[:old_n] if e in eps_json},
                        sort_keys=True, separators=(",", ":"),
                    ),
                })

        def anime_pagination(h: H, last: int):
            h.leaf("a", "»", href=f"https://{host}/anime/page/{last}")

        self._listing_pages(
            lambda p: f"https://{host}/anime/page/{p}",
            f"https://{host}/anime",
            cards,
            anime_pagination,
        )
        self.seeds.append({
            "url": f"https://{host}/anime", "site": "fasel",
            "category": "anime", "priority": 0, "depth": 0, "role": "listing",
            "url_template": f"https://{host}/anime/page/{{p}}",
        })
        # robots: fasel.test entry already added by _build_fasel

    # ======================================================================
    # AKWAM
    # ======================================================================
    def _akwam_detail_head(self, h: H, title: str, image_url: str, genre_ids):
        h.leaf(
            "h1", f"  {title}  ",
            class_="entry-title font-size-28 font-weight-bold text-white mb-0",
        )
        h.open("div", class_="col-lg-3 col-md-4 text-center mb-5 mb-md-0")
        h.leaf("a", "poster", href=image_url)
        h.close("div")
        for gid in genre_ids:
            h.leaf(
                "a", AKWAM_GENRES[gid],
                class_="badge badge-pill badge-light ml-2",
                href=f"https://akwam.test/genre?id={gid}",
            )

    def _build_akwam(self):
        host = "akwam.test"

        def akwam_pagination(h: H, last: int):
            h.leaf("a", "1", class_="page-link", href="#")
            h.leaf("a", str(last), class_="page-link", href="#")
            h.leaf("a", "next", class_="page-link", href="#")
            h.leaf("a", "last", class_="page-link", href="#")

        # ---- arabic movies (flat; detail carries all fields) ----
        n = self.cfg.items["akwam_movies"]
        cards = []
        for i in range(n):
            movie_id = str(4000 + i)
            title = f"فيلم Alpha{i} عربي {i % 13}"
            slug = f"m-{_slug(title, i)}"
            detail = f"https://{host}/movie/{movie_id}/{slug}"
            gids = [AKWAM_GENRE_IDS[(i + k) % len(AKWAM_GENRE_IDS)] for k in range(i % 3)]
            image_url = f"https://img.akwam.test/{movie_id}.jpg"
            short_id = f"sl{movie_id}"

            def card(h: H, href=detail):
                h.open("a", class_="icn play", href=href)
                h.text("مشاهدة")
                h.close("a")
            cards.append(card)

            h = H()
            self._akwam_detail_head(h, title, image_url, gids)
            h.open("a", class_="link-btn link-show d-flex align-items-center px-3",
                   href=f"https://{host}/link/{short_id}")
            h.text("الذهاب للمشاهدة")
            h.close("a")
            self._add_page(detail, h.page())

            key = movie_id + "-akwam-movies"
            self._cache_image(key, i)
            self.golden_flat.append({
                "site": "akwam", "category": "arabic-movies", "item_id": movie_id,
                "title": title.strip(),
                "fmt": None,
                "genres": [AKWAM_GENRES[g] for g in gids],
                "image_source": resolve_image(key, image_url, self.image_cache),
                "source": f"https://{host}/watch/{short_id}/{movie_id}",
                "rating": None, "tmdb_id": None,
                "sources_json": None, "season_number": None,
            })

        self._listing_pages(
            lambda p: f"https://{host}/movies?section=0&language=1&page={p}",
            f"https://{host}/movies?section=0&language=1",
            cards,
            akwam_pagination,
        )
        self.seeds.append({
            "url": f"https://{host}/movies?section=0&language=1",
            "site": "akwam", "category": "arabic-movies",
            "priority": 0, "depth": 0, "role": "listing",
            "url_template": f"https://{host}/movies?section=0&language=1&page={{p}}",
        })

        # ---- arabic series (nested, 3-hop episode chase) ----
        n = self.cfg.items["akwam_series"]
        s_cards = []
        for i in range(n):
            series_id = str(5000 + i)
            title = f"مسلسل Beta{i} عربي"
            slug = f"s-{_slug(title, i)}"
            detail = f"https://{host}/series/{series_id}/{slug}"
            gids = [AKWAM_GENRE_IDS[(i + 2 + k) % len(AKWAM_GENRE_IDS)] for k in range(1 + i % 2)]
            image_url = f"https://img.akwam.test/{series_id}.jpg"

            def s_card(h: H, href=detail):
                h.open("a", class_="icn play", href=href)
                h.text("مشاهدة")
                h.close("a")
            s_cards.append(s_card)

            n_eps = 2 + i % 4
            h = H()
            self._akwam_detail_head(h, title, image_url, gids)
            ep_ids = [str(6000 + 100 * i + e) for e in range(1, n_eps + 1)]
            for k, eid in enumerate(ep_ids, start=1):
                h.open("h2", class_="font-size-18 text-white mb-2")
                h.leaf("a", f"الحلقة {k}", href=f"https://{host}/episode/{eid}/ep-{k}")
                h.close("h2")
            self._add_page(detail, h.page())

            eps_json = {}
            for k, eid in enumerate(ep_ids, start=1):
                short = f"es{eid}"
                watch = f"https://{host}/watch/{short}/{eid}"
                # hop 1: select page
                sh = H()
                sh.open("a", class_="link-btn link-show d-flex align-items-center px-3",
                        href=f"https://{host}/link/{short}")
                sh.text("روابط التحميل")
                sh.close("a")
                self._add_page(f"https://{host}/episode/{eid}/ep-{k}", sh.page())
                # hop 2: short-link page
                lh = H()
                lh.leaf("a", "download", class_="download-link", href=watch)
                self._add_page(f"https://{host}/link/{short}", lh.page())
                # hop 3: watch page
                wh = H()
                wh.open("h2", class_="font-size-20 font-weight-bold")
                wh.leaf("a", f"{k} حلقة", href="#")
                wh.close("h2")
                self._add_page(watch, wh.page())
                eps_json[eid] = {"Episode Number": k, "Source": watch}

            key = series_id + "-akwam-series"
            self._cache_image(key, i)
            self.golden_series.append({
                "site": "akwam", "category": "arabic-series", "series_id": series_id,
                "title": title.strip(), "fmt": "WEB-DL",
                "genres": [AKWAM_GENRES[g] for g in gids],
                "image_source": resolve_image(key, image_url, self.image_cache),
                "episodes_total": n_eps,
                "seasons_json": json.dumps(eps_json, sort_keys=True, separators=(",", ":")),
            })
            if i % 4 == 1:
                self.seen_prior.append({
                    "url": canonicalize_url(detail), "item_id": series_id,
                    "episode_count": n_eps - 1,
                })

        self._listing_pages(
            lambda p: f"https://{host}/series?section=0&language=1&page={p}",
            f"https://{host}/series?section=0&language=1",
            s_cards,
            akwam_pagination,
        )
        self.seeds.append({
            "url": f"https://{host}/series?section=0&language=1",
            "site": "akwam", "category": "arabic-series",
            "priority": 0, "depth": 0, "role": "listing",
            "url_template": f"https://{host}/series?section=0&language=1&page={{p}}",
        })
        self.robots.append({
            "host": host, "disallow_prefixes": [],
            "crawl_delay_ms": dhash("delay", host) % 400,
        })

    # ======================================================================
    # HDW (listing-only)
    # ======================================================================
    def _build_hdw(self):
        host = "hdw.test"
        n = self.cfg.items["hdw"]
        cards = []
        for i in range(n):
            item_id = str(3000 + i)
            title = f"HDW Movie {i} Gamma{i % 11}"
            href = f"/watch/{item_id}/ep-{i % 5}"
            rating = None if i % 4 == 1 else f"{(i % 40) / 10 + 5:.1f}".replace(".", ",")
            genres = [GENRE_SLUGS[(i + k) % len(GENRE_SLUGS)].capitalize() for k in range(1 + i % 2)]
            image = f"https://img.hdw.test/{item_id}.jpg"

            def card(h: H, href=href, title=title, rating=rating, genres=genres, image=image):
                h.open("a", href="#poster")
                h.leaf("img", None, src=image)
                if rating is not None:
                    h.leaf("span", f" {rating} ", class_="float-left yellow")
                h.close("a")
                h.open("div", class_="content-info")
                h.open("a", href=href)
                h.leaf("span", title)
                h.close("a")
                h.leaf("span", ", ".join(genres), class_="content-views")
                h.close("div")
            cards.append(card)

            self.golden_flat.append({
                "site": "hdw", "category": "hdwmovies", "item_id": item_id,
                "title": title, "fmt": None, "genres": genres,
                "image_source": image,
                "source": f"https://{host}/free{href}",
                "rating": None if rating is None else rating.replace(",", ".").strip(),
                "tmdb_id": None, "sources_json": None, "season_number": None,
            })

        def hdw_pagination(h: H, last: int):
            h.leaf("a", "1", class_="page-link", href="#")
            h.leaf("a", str(last), class_="page-link", href="#")
            h.leaf("a", "next", class_="page-link", href="#")

        # reference fetches pages 1..last+1 (HDWMoviesScraper.py:60 quirk);
        # generate an empty page last+1 so the over-scan finds a valid page.
        per = self.cfg.items_per_page
        n_pages = (len(cards) + per - 1) // per or 1
        empty = H()
        empty.leaf("h3", "Empty")
        hdw_pagination(empty, n_pages)
        self._add_page(f"https://{host}/movies?page={n_pages + 1}", empty.page())

        self._listing_pages(
            lambda p: f"https://{host}/movies?page={p}",
            f"https://{host}/movies",
            cards,
            hdw_pagination,
        )
        self.seeds.append({
            "url": f"https://{host}/movies", "site": "hdw",
            "category": "hdwmovies", "priority": 0, "depth": 0, "role": "listing",
            "url_template": f"https://{host}/movies?page={{p}}",
        })
        self.robots.append({
            "host": host, "disallow_prefixes": [],
            "crawl_delay_ms": dhash("delay", host) % 400,
        })

    # ======================================================================
    # WECIMA (listing-only)
    # ======================================================================
    def _build_wecima(self):
        host = "wecima.test"
        n = self.cfg.items["wecima"]
        cards = []
        for i in range(n):
            item_id = f"wc{2000 + i}"
            title = f"WeCima Delta{i}"
            season = f"الموسم {1 + i % 4}"
            href = f"https://{host}/series/{_slug(title, i)}-s{1 + i % 4}"
            image = f"https://img.wecima.test/{item_id}.webp"

            def card(h: H, item_id=item_id, title=title, season=season, href=href, image=image, i=i):
                h.open("div", class_="GridItem", cpd=item_id)
                h.open("a", href=href, title=season)
                h.leaf("strong", f"{title} - 2023", class_="hasyear")
                h.leaf("span", None, class_="BG--GridItem",
                       data_lazy_style=f"--image:url({image});")
                h.close("a")
                h.close("div")
            cards.append(card)

            self.golden_flat.append({
                "site": "wecima", "category": "wecima", "item_id": item_id,
                "title": title,  # strong text split('-')[0].strip()
                "fmt": None, "genres": None,
                "image_source": image,
                # href.replace("https://wecima.tube/series/", "") — host differs,
                # so the full href survives (reference semantics preserved)
                "source": href,
                "rating": None, "tmdb_id": None, "sources_json": None,
                "season_number": o_remove_arabic(season),
            })

        def wecima_pagination(h: H, last: int):
            h.open("ul", class_="page-numbers")
            h.leaf("li", "1")
            h.leaf("li", str(last))
            h.leaf("li", "next")
            h.close("ul")

        self._listing_pages(
            lambda p: f"https://{host}/download-series/?page_number={p}/",
            f"https://{host}/download-series/",
            cards,
            wecima_pagination,
        )
        self.seeds.append({
            "url": f"https://{host}/download-series/", "site": "wecima",
            "category": "wecima", "priority": 0, "depth": 0, "role": "listing",
            "url_template": f"https://{host}/download-series/?page_number={{p}}/",
        })
        self.robots.append({
            "host": host, "disallow_prefixes": [],
            "crawl_delay_ms": dhash("delay", host) % 400,
        })

    # ======================================================================
    # CIMANOW (listing -> watch)
    # ======================================================================
    def _build_cimanow(self):
        host = "cimanow.test"
        n = self.cfg.items["cimanow"]
        route = "arabic-movies-route"
        cards = []
        for i in range(n):
            title = f"CimaNow Epsilon{i}"
            slug = _slug(title, i)
            raw_genres = " ، ".join(
                CIMA_GENRES_AR[(i + k) % len(CIMA_GENRES_AR)] for k in range(1 + i % 2)
            )
            image = f"https://img.cimanow.test/{slug}.jpg"
            watch = f"https://{host}/{slug}/watching"

            def card(h: H, slug=slug, title=title, raw_genres=raw_genres, image=image):
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

            qualities = ["1080p", "720p", "480p"][: 1 + i % 3]
            sources = [
                {q: f"https://dl.cimanow.test/{slug}/{q}.mp4"} for q in qualities
            ]
            wh = H()
            wh.open("ul", id="download")
            wh.open("li")
            for q in qualities:
                wh.leaf("a", f"{q} download", href=f"https://dl.cimanow.test/{slug}/{q}.mp4")
            wh.close("li")
            wh.close("ul")
            self._add_page(watch, wh.page())

            # deterministic id replaces the reference's irreproducible
            # str(hash(title))[1:7] (CimaNowMovieScraper.py:54, O25)
            cn_id = md5(title.encode()).hexdigest()[:6]
            genres = [CIMA_NOW_GENRES.get(g) for g in raw_genres.split(" ، ")]
            self.golden_flat.append({
                "site": "cimanow", "category": "cimanow-movie", "item_id": cn_id,
                "title": title, "fmt": None, "genres": genres,
                "image_source": image,
                "source": None, "rating": None,
                "tmdb_id": self._tmdb(title, "movies"),
                "sources_json": json.dumps(sources),
                "season_number": None,
            })

        def cn_pagination(h: H, last: int):
            # must be the LAST <ul> in the document (Common.py:388-389)
            h.open("ul", class_="pagination")
            h.leaf("li", "1")
            h.leaf("li", str(last))
            h.close("ul")

        # wrap cards in <section> (CimaNowMovieScraper.py:36)
        def section_cards(card_fns):
            def renders(h: H):
                for fn in card_fns:
                    fn(h)
            return renders

        per = self.cfg.items_per_page
        chunks = [cards[k : k + per] for k in range(0, len(cards), per)] or [[]]
        last = len(chunks)
        for p, chunk in enumerate(chunks, start=1):
            h = H()
            h.open("section")
            section_cards(chunk)(h)
            h.close("section")
            cn_pagination(h, last)
            built = h.page()
            self._add_page(f"https://{host}/category/{route}/page/{p}", built)
            if p == 1:
                self._add_page(f"https://{host}/category/{route}", built)

        self.seeds.append({
            "url": f"https://{host}/category/{route}", "site": "cimanow",
            "category": "cimanow-movie", "priority": 0, "depth": 0,
            "role": "listing",
            "url_template": f"https://{host}/category/{route}/page/{{p}}",
        })
        self.robots.append({
            "host": host, "disallow_prefixes": [],
            "crawl_delay_ms": dhash("delay", host) % 400,
        })

    # ----------------------------------------------------------------------
    def _build(self):
        self._build_fasel()
        self._build_fasel_anime()
        self._build_akwam()
        self._build_hdw()
        self._build_wecima()
        self._build_cimanow()

    # -- Spark loaders ------------------------------------------------------
    def pages_df(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [
                (p["url"], p["warc_offset"], p["html"], p["text"], p["lang"])
                for p in self.pages
            ],
            "url string, warc_offset long, html binary, text string, lang string",
        )
        return df.withColumn(
            "warc_ts",
            F.to_timestamp(F.lit(EPOCH)) + F.make_interval(secs=F.col("warc_offset")),
        ).drop("warc_offset")

    def seeds_df(self, spark):
        return spark.createDataFrame(
            [
                (s["url"], s["site"], s["category"], s["priority"], s["depth"],
                 s["role"], s["url_template"])
                for s in self.seeds
            ],
            "url string, site string, category string, priority int, depth int, "
            "role string, url_template string",
        )

    def robots_df(self, spark):
        return spark.createDataFrame(
            [
                (r["host"], r["disallow_prefixes"], r["crawl_delay_ms"])
                for r in self.robots
            ],
            "host string, disallow_prefixes array<string>, crawl_delay_ms int",
        )

    def image_cache_df(self, spark):
        return spark.createDataFrame(
            list(self.image_cache.items()) or [("", "")],
            "content_id string, image_url string",
        )

    def tmdb_df(self, spark):
        rows = sorted({(t["title"], t["kind"], t["tmdb_id"]) for t in self.tmdb_lookup})
        return spark.createDataFrame(
            rows or [("", "", 0)], "title string, kind string, tmdb_id long"
        )

    def translations_df(self, spark):
        return spark.createDataFrame(
            [(t["ar_title"], t["en_title"]) for t in self.translations]
            or [("", "")],
            "ar_title string, en_title string",
        )

    def anime_prior_df(self, spark):
        return spark.createDataFrame(
            [
                (p["series_id"], p["old_count"], p["old_eps_json"])
                for p in self.anime_prior
            ]
            or [("", 0, "{}")],
            "series_id string, old_count int, old_eps_json string",
        )

    def seen_prior_df(self, spark):
        return spark.createDataFrame(
            [(s["url"], s["item_id"], s["episode_count"]) for s in self.seen_prior]
            or [("", "", 0)],
            "url string, item_id string, episode_count int",
        )

    def trending_links_df(self, spark):
        """Akwam homepage "recents" stand-in (``TrendingScraper.py:15-28``
        input shape): every 3rd stored akwam item plus links that must NOT
        match (unknown id; non-series/movie path).  The fixture web has no
        homepage page, so the homepage scan's *output* is synthesized
        deterministically from the golden records instead."""
        rows = [
            (f"https://akwam.test/movie/{g['item_id']}/{_slug(g['title'], 0)}",)
            for g in self.golden_flat
            if g["site"] == "akwam" and int(g["item_id"]) % 3 == 0
        ] + [
            (f"https://akwam.test/series/{g['series_id']}/{_slug(g['title'], 0)}",)
            for g in self.golden_series
            if g["site"] == "akwam" and int(g["series_id"]) % 3 == 0
        ] + [
            ("https://akwam.test/movie/999999/unknown",),
            ("https://akwam.test/shows/123/not-a-category",),
        ]
        return spark.createDataFrame(rows, "link string")

    def trending_titles_df(self, spark):
        """Fasel homepage trending stand-in (``TrendingScraper.py:66-114``
        input shape): (link, title) pairs for every 4th stored fasel record,
        with the category encoded in the link the way ``url_category``
        classifies it and the title case/whitespace-mangled so the match
        exercises the normalized key, plus one no-match row."""
        enc = {"movies": "%d9%81%d9%8a%d9%84%d9%85", "series": "watch"}
        rows = []
        for g in self.golden_flat + self.golden_series:
            if g["site"] != "fasel":
                continue
            gid = int(g.get("item_id") or g["series_id"])
            if gid % 4 != 0:
                continue
            link = f"https://fasel.test/{enc[g['category']]}/{gid}"
            rows.append((link, g["title"].upper().replace(" ", "   ")))
        rows.append(("https://fasel.test/watch/0", "No Such Title"))
        return spark.createDataFrame(rows, "link string, title string")
