"""Image-upload side-effect stage — the live half of O15.

Reference ``Common.py:217-254`` (``upload_image``): cache hit → cached
URL; empty source → placeholder; else download the poster, convert
``.webp`` → ``.jpg`` via PIL, POST to Imgur, and fall back to the
placeholder on any failure.  The offline engine reproduces the *decision
chain* as a broadcast join (``plans/assemble.resolve_image``); this module
is the isolated live adapter for the upload side effect itself, shaped
like ``plans/live_fetch.py``:

- **Transport-injected**: the downloader (``url → bytes``), converter
  (``bytes → bytes``) and uploader (``content_id, bytes → hosted url``)
  are plain callables; the defaults require requests/PIL and raise
  ``NotImplementedError`` in this sandbox, while tests inject
  deterministic fakes — the full distributed path runs either way.
- **Retry budget + dead-letter**: the reference's bare ``try/except →
  placeholder`` hides every failure; here uploads retry with exponential
  backoff up to ``max_retries`` and exhausted rows become dead-letter
  rows (``status='dead'`` + the placeholder URL), so a 10^7-image run
  reports what actually failed instead of silently shipping placeholders.
- **Two shapes**: ``upload_images`` (mapInPandas → result rows, feeds the
  cache table for the next run's broadcast join) and
  ``upload_images_foreach`` (``foreachPartition`` + accumulators — the
  pure side-effect form for when results are recorded by the remote
  service itself, promised in SURVEY §2.1 O15).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.decode_tables import PLACEHOLDER_IMAGE

Fetcher = Callable[[str], bytes]
Converter = Callable[[bytes], bytes]
Uploader = Callable[[str, bytes], str]

UPLOAD_RESULT_DDL = (
    "content_id string, image_url string, hosted_url string, "
    "status string, attempts int"
)


@dataclass
class UploadConfig:
    max_retries: int = 3
    backoff_ms: int = 250         # doubled per retry
    placeholder: str = PLACEHOLDER_IMAGE
    timeout_s: float = 20.0


def requests_fetcher(cfg: UploadConfig) -> Fetcher:
    try:
        import requests
    except ImportError as e:  # pragma: no cover - sandbox has no requests
        raise NotImplementedError(
            "live image download needs 'requests'; inject a fetcher"
        ) from e

    def _get(url: str) -> bytes:
        # HTTP errors must surface as exceptions so the retry budget /
        # dead-letter path triggers — a 404 body is not image bytes, and
        # caching it would poison the image cache for every later run.
        resp = requests.get(url, timeout=cfg.timeout_s)
        resp.raise_for_status()
        ctype = resp.headers.get("Content-Type", "")
        if ctype and not (
            ctype.startswith("image/")
            or ctype.startswith("application/octet-stream")
        ):
            raise ValueError(f"non-image Content-Type {ctype!r} for {url}")
        return resp.content

    return _get


def pil_webp_converter() -> Converter:
    """``Common.py:240-247``: .webp payload → RGB jpeg bytes."""
    try:
        import io

        import PIL.Image
    except ImportError as e:  # pragma: no cover - sandbox has no PIL
        raise NotImplementedError(
            "webp→jpg conversion needs PIL; inject a converter"
        ) from e

    def _conv(payload: bytes) -> bytes:
        img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
        out = io.BytesIO()
        img.save(out, "jpeg")
        return out.getvalue()

    return _conv


def _process_one(
    rec: dict,
    cfg: UploadConfig,
    fetcher: Fetcher,
    converter: Converter,
    uploader: Uploader,
    sleep,
) -> dict:
    cid, url = rec["content_id"], rec["image_url"]
    if not url:
        # Common.py:227-228 — empty source short-circuits to the placeholder
        return {
            "content_id": cid, "image_url": url,
            "hosted_url": cfg.placeholder, "status": "placeholder",
            "attempts": 0,
        }
    attempts = 0
    backoff = cfg.backoff_ms / 1000.0
    while attempts <= cfg.max_retries:
        attempts += 1
        try:
            payload = fetcher(url)
            if ".webp" in url:
                payload = converter(payload)
            hosted = uploader(cid, payload)
            return {
                "content_id": cid, "image_url": url, "hosted_url": hosted,
                "status": "uploaded", "attempts": attempts,
            }
        except Exception:
            if attempts <= cfg.max_retries:
                sleep(backoff)
                backoff *= 2
    # dead-letter: budget exhausted — placeholder URL, but the failure is
    # visible (the reference's except→placeholder made these unobservable)
    return {
        "content_id": cid, "image_url": url,
        "hosted_url": cfg.placeholder, "status": "dead",
        "attempts": attempts,
    }


def upload_images(
    images: DataFrame,
    cfg: UploadConfig | None = None,
    fetcher: Fetcher | None = None,
    converter: Converter | None = None,
    uploader: Uploader | None = None,
    sleep=time.sleep,
) -> DataFrame:
    """(content_id, image_url) → upload results, one row per input.

    Input rows should already be cache-misses (the broadcast cache join in
    ``resolve_image`` is the cheap first pass — ``Common.py:223-225``);
    the result table's ``uploaded`` rows are appended to the cache for the
    next run."""
    cfg = cfg or UploadConfig()

    def _run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        f = fetcher or requests_fetcher(cfg)
        c = converter or pil_webp_converter()
        u = uploader
        if u is None:
            raise NotImplementedError(
                "no default public uploader — inject an uploader callable"
            )
        for pdf in batches:
            rows = [
                _process_one(rec, cfg, f, c, u, sleep)
                for rec in pdf.to_dict("records")
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "content_id", "image_url", "hosted_url", "status",
                    "attempts",
                ],
            )

    return images.mapInPandas(_run, schema=UPLOAD_RESULT_DDL)


def upload_images_foreach(
    images: DataFrame,
    cfg: UploadConfig | None = None,
    fetcher: Fetcher | None = None,
    converter: Converter | None = None,
    uploader: Uploader | None = None,
    sleep=time.sleep,
) -> dict:
    """Pure side-effect form: ``foreachPartition`` + outcome accumulators.

    Returns {'uploaded': n, 'placeholder': n, 'dead': n} — per-row results
    live with the remote service; the counts are the driver-visible audit
    trail (plus Spark's task metrics)."""
    cfg = cfg or UploadConfig()
    sc = images.sparkSession.sparkContext
    acc_ok = sc.accumulator(0)
    acc_ph = sc.accumulator(0)
    acc_dead = sc.accumulator(0)

    def _part(rows):
        f = fetcher or requests_fetcher(cfg)
        c = converter or pil_webp_converter()
        u = uploader
        if u is None:
            raise NotImplementedError(
                "no default public uploader — inject an uploader callable"
            )
        for r in rows:
            out = _process_one(r.asDict(), cfg, f, c, u, sleep)
            if out["status"] == "uploaded":
                acc_ok.add(1)
            elif out["status"] == "placeholder":
                acc_ph.add(1)
            else:
                acc_dead.add(1)

    images.select("content_id", "image_url").foreachPartition(_part)
    return {
        "uploaded": acc_ok.value,
        "placeholder": acc_ph.value,
        "dead": acc_dead.value,
    }
