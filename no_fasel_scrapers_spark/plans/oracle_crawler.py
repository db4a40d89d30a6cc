"""Single-threaded crawl-ordering oracle (SURVEY.md §5.2-2, FIXTURES.md §7).

Implements the engine's deterministic crawl contract in plain sequential
Python: waves by depth of discovery, within a wave the total order
``(priority ASC, depth ASC, url_hash ASC)``, robots gating, seen-set dedup,
budget carry-over, pagination expansion (incl. the HDW last+1 over-scan
quirk).  The Spark engine, run at ANY parallelism, must produce the same
``(wave, rank, url)`` sequence and the same final seen set — that is the
north_rule determinism criterion, evidenced in tests/test_crawl.py at
local[2] vs local[8].

Shares only the leaf extractors (functions/extract.py) with the engine —
the *scheduling* logic being verified is implemented independently here.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..functions.canonical_py import canonicalize_url, host_of
from ..functions.extract import extract_page, site_of_host
from ..functions.xxh64 import xxh64_signed


@dataclass
class OracleResult:
    orders: list[tuple[int, int, str]]   # (wave, rank, canonical url)
    seen: set[str]
    extracted: list[dict]                # raw extract_page outputs + wave


def crawl_oracle(
    pages: dict[str, bytes],
    seeds: list[dict],
    robots: list[dict],
    *,
    wave_budget: int | None = None,
    max_waves: int = 24,
    seen_prior: set[str] | None = None,
) -> OracleResult:
    disallow = {r["host"]: r["disallow_prefixes"] for r in robots}
    seen_hashes: set[int] = set()
    seen_urls: set[str] = set()
    if seen_prior:
        for u in seen_prior:
            cu = canonicalize_url(u)
            seen_hashes.add(xxh64_signed(cu))
            seen_urls.add(cu)

    def mk_row(url, site, category, role, template, depth, priority):
        cu = canonicalize_url(url)
        return {
            "url": cu, "url_hash": xxh64_signed(cu), "host": host_of(cu),
            "site": site, "category": category, "role": role,
            "url_template": template, "depth": depth, "priority": priority,
        }

    frontier = [
        mk_row(s["url"], s["site"], s["category"], s["role"],
               s.get("url_template"), s.get("depth", 0), s.get("priority", 0))
        for s in seeds
    ]

    orders: list[tuple[int, int, str]] = []
    extracted_all: list[dict] = []
    wave_no = 0

    while frontier and wave_no < max_waves:
        # within-frontier dedup (keep best by order key)
        best: dict[int, dict] = {}
        for r in sorted(
            frontier, key=lambda r: (r["priority"], r["depth"], r["url_hash"])
        ):
            best.setdefault(r["url_hash"], r)
        rows = sorted(
            best.values(), key=lambda r: (r["priority"], r["depth"], r["url_hash"])
        )
        if wave_budget is not None:
            wave, leftover = rows[:wave_budget], rows[wave_budget:]
        else:
            wave, leftover = rows, []

        def path_of(url: str) -> str:
            rest = url.split("://", 1)[-1]
            i = rest.find("/")
            return "/" if i < 0 else rest[i:].split("?", 1)[0].split("#", 1)[0]

        allowed = [
            r for r in wave
            if not any(
                path_of(r["url"]).startswith(p)
                for p in disallow.get(r["host"], [])
            )
        ]
        fresh = [r for r in allowed if r["url_hash"] not in seen_hashes]

        rank = 0
        new_frontier: list[dict] = list(leftover)
        for r in fresh:
            orders.append((wave_no, rank, r["url"]))
            rank += 1
            seen_hashes.add(r["url_hash"])
            seen_urls.add(r["url"])
            html = pages.get(r["url"])
            out = extract_page(r["url"], r["role"], html)
            out["wave"] = wave_no
            out["category"] = r["category"]
            out["depth"] = r["depth"]
            extracted_all.append(out)
            for link in out["links"] or []:
                new_frontier.append(
                    mk_row(
                        link["url"],
                        site_of_host(host_of(link["url"])),
                        r["category"], link["role"], None,
                        r["depth"] + 1, r["priority"],
                    )
                )
            if out["last_page"] is not None and r["url_template"]:
                last = out["last_page"] + (1 if r["site"] == "hdw" else 0)
                for p in range(1, last + 1):
                    new_frontier.append(
                        mk_row(
                            r["url_template"].replace("{p}", str(p)),
                            r["site"], r["category"], "listing", None,
                            r["depth"] + 1, r["priority"],
                        )
                    )
        frontier = [
            r for r in new_frontier if r["url_hash"] not in seen_hashes
        ]
        wave_no += 1

    return OracleResult(orders=orders, seen=seen_urls, extracted=extracted_all)
