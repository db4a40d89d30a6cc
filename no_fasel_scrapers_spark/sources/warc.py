"""WARC source/sink as a PySpark Python DataSource (pages-table ingest).

The engine's input is an Iceberg-shaped table of Common-Crawl-style pages
``(url, warc_ts, html, text, lang)``.  Real Common-Crawl deliveries are
WARC files; this module makes them a first-class source:

    spark.dataSource.register(WarcDataSource)
    pages = spark.read.format("warc").load("/data/segments")   # dir or file
    pages.write.format("warc").mode("append").save("/out")     # archive sink

Scale design (100 TB = ~100k x 1 GB .warc.gz files):

- **one input partition per WARC file** — the unit Common Crawl itself
  shards by; a 1000-executor cluster streams files independently, no
  shuffle, no cross-file state.  Records inside a file are read
  sequentially (gzip members / Content-Length framing force this — WARC
  is not splittable), so file count, not file size, bounds parallelism.
- **host-index file pruning**: the sink writes a ``<file>.hosts.json``
  sidecar (distinct hosts in that file).  ``pushFilters`` accepts
  ``url`` prefix predicates (``StringStartsWith``) and drops whole files
  whose sidecar proves no record can match — partition pruning for an
  external format Catalyst cannot see into.  Surviving predicates are
  also applied row-level before the payload is materialized into Arrow.
- stdlib only (``gzip``, ``email``-free hand parser): no cluster-side
  package installs needed for the reader path.

Reference parity note: the reference fetches live HTML over HTTP
(``Common.py:107-138``); in the offline engine the pages table *is* the
fetch universe (SURVEY §7.2) and WARC is how such a universe arrives
from an archive crawl.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import uuid
from datetime import datetime
from typing import Iterator
from urllib.parse import urlsplit

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
_WARC_DATE = "%Y-%m-%dT%H:%M:%SZ"


# ---------------------------------------------------------------------------
# plain-python WARC framing (WARC/1.0, response records)
# ---------------------------------------------------------------------------

def _read_headers(fh) -> dict[str, str] | None:
    """Read a CRLF-terminated header block; None at EOF."""
    line = fh.readline()
    while line in (b"\r\n", b"\n"):          # skip inter-record blank lines
        line = fh.readline()
    if not line:
        return None
    headers: dict[str, str] = {}
    first = line.decode("latin-1").rstrip("\r\n")
    headers["__version__"] = first
    while True:
        line = fh.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        k, _, v = line.decode("latin-1").rstrip("\r\n").partition(":")
        headers[k.strip().lower()] = v.strip()
    return headers


def iter_warc_records(fh) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (warc_headers, block_bytes) per record from a binary stream."""
    while True:
        headers = _read_headers(fh)
        if headers is None:
            return
        if not headers["__version__"].startswith("WARC/"):
            raise ValueError(
                f"not a WARC record boundary: {headers['__version__']!r}"
            )
        n = int(headers.get("content-length", "0"))
        block = fh.read(n)
        if len(block) != n:
            raise ValueError("truncated WARC record block")
        yield headers, block


def _http_payload(block: bytes) -> bytes:
    """Strip the HTTP response envelope from a response record block."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        sep = block.find(b"\n\n")
        return block[sep + 2:] if sep >= 0 else block
    return block[sep + 4:]


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def _list_warc_files(path: str) -> list[str]:
    if os.path.isdir(path):
        out = [
            p
            for p in sorted(glob.glob(os.path.join(path, "**", "*"), recursive=True))
            if os.path.isfile(p)
            and (p.endswith(".warc") or p.endswith(".warc.gz"))
        ]
    else:
        out = sorted(glob.glob(path)) if any(c in path for c in "*?[") else [path]
    if not out:
        raise FileNotFoundError(f"no .warc/.warc.gz files under {path!r}")
    return out


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a load(path)")
        self._url_prefixes: list[str] = []

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Accept url-prefix predicates; everything else stays in Spark.

        Accepted filters prune whole files via the ``.hosts.json`` sidecar
        and rows before payload materialization."""
        for f in filters:
            if isinstance(f, StringStartsWith) and f.attribute == ("url",):
                self._url_prefixes.append(f.value)
            else:
                yield f

    def _file_may_match(self, path: str) -> bool:
        # pushed filters combine with AND (Spark's pushFilters contract):
        # a row must satisfy EVERY accepted prefix, so the file can be
        # pruned as soon as ANY prefix has no candidate host in the sidecar
        if not self._url_prefixes:
            return True
        sidecar = path + ".hosts.json"
        if not os.path.exists(sidecar):
            return True                      # no index → cannot prune
        try:
            with open(sidecar) as fh:
                hosts = set(json.load(fh))
        except (OSError, ValueError):
            return True
        for prefix in self._url_prefixes:
            ph = urlsplit(prefix).netloc
            if not ph:                        # prefix shorter than a host
                continue                     # can't disprove this one
            # prefix may itself be a partial host ("https://ak")
            if prefix.endswith(ph) and not urlsplit(prefix).path:
                if not any(h.startswith(ph) or h == ph for h in hosts):
                    return False
            elif ph not in hosts:
                return False
        return True

    def partitions(self):
        parts = [
            _WarcFilePartition(p)
            for p in _list_warc_files(self.path)
            if self._file_may_match(p)
        ]
        # Spark's Python DataSource API rejects an empty partition list
        # (read(None) is called); a sentinel empty partition yields 0 rows
        return parts or [_WarcFilePartition(None)]

    def read(self, partition: _WarcFilePartition):
        if partition is None or partition.path is None:
            return
        prefixes = self._url_prefixes
        with _open(partition.path) as fh:
            for headers, block in iter_warc_records(fh):
                if headers.get("warc-type") != "response":
                    continue
                url = headers.get("warc-target-uri", "")
                # AND semantics: Spark does not re-apply accepted filters,
                # so a row must satisfy every pushed prefix here
                if prefixes and not all(url.startswith(p) for p in prefixes):
                    continue
                ts = None
                raw_ts = headers.get("warc-date")
                if raw_ts:
                    try:
                        ts = datetime.strptime(raw_ts, _WARC_DATE)
                    except ValueError:
                        ts = None
                yield (url, ts, _http_payload(block), None, None)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

class _WarcCommit(WriterCommitMessage):
    def __init__(self, path: str, sidecar: str):
        self.path = path
        self.sidecar = sidecar


class WarcWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc sink requires a save(path)")
        self.overwrite = overwrite
        self.gzip = options.get("compression", "gzip") != "none"

    def write(self, rows) -> _WarcCommit:
        os.makedirs(self.path, exist_ok=True)
        ext = ".warc.gz" if self.gzip else ".warc"
        # task-unique temp name; commit() renames → failed/retried tasks
        # leave only .tmp litter, never half-visible data files
        base = os.path.join(self.path, f"part-{uuid.uuid4().hex}{ext}")
        tmp = base + ".tmp"
        hosts: set[str] = set()
        # stream straight to the tmp file — O(record) memory, not a whole
        # ~1 GB gzipped archive buffered per concurrent write task
        fh = open(tmp, "wb")
        out = gzip.GzipFile(fileobj=fh, mode="wb", mtime=0) if self.gzip else fh
        n = 0
        for row in rows:
            url = row.url or ""
            hosts.add(urlsplit(url).netloc)
            html = bytes(row.html) if row.html is not None else b""
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Length: "
                + str(len(html)).encode()
                + b"\r\n\r\n"
                + html
            )
            ts = row.warc_ts
            head = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\n"
                + (
                    f"WARC-Date: {ts.strftime(_WARC_DATE)}\r\n"
                    if ts is not None
                    else ""
                )
                + "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode()
            out.write(head + http + b"\r\n\r\n")
            n += 1
        if self.gzip:
            out.close()
        fh.close()
        if n == 0:
            os.remove(tmp)
            return _WarcCommit("", "")
        sidecar = base + ".hosts.json"
        with open(tmp + ".hosts", "w") as fh:
            json.dump(sorted(hosts), fh)
        return _WarcCommit(base, sidecar)

    def commit(self, messages) -> None:
        if self.overwrite:
            keep = {m.path for m in messages if m and m.path}
            for p in glob.glob(os.path.join(self.path, "part-*")):
                if not p.endswith((".tmp", ".tmp.hosts")) and (
                    p.split(".hosts.json")[0] not in keep
                ):
                    os.remove(p)
        for m in messages:
            if m and m.path:
                os.replace(m.path + ".tmp", m.path)
                os.replace(m.path + ".tmp.hosts", m.sidecar)

    def abort(self, messages) -> None:
        for m in messages:
            if m and m.path:
                for p in (m.path + ".tmp", m.path + ".tmp.hosts"):
                    try:
                        os.remove(p)
                    except OSError:
                        pass


# ---------------------------------------------------------------------------
# data source
# ---------------------------------------------------------------------------

class WarcDataSource(DataSource):
    """``format("warc")`` — register with
    ``spark.dataSource.register(WarcDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return PAGES_DDL

    def reader(self, schema: StructType) -> WarcReader:
        return WarcReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> WarcWriter:
        return WarcWriter(self.options, overwrite)


def register(spark) -> None:
    """Register ``format("warc")`` and enable Python-source filter
    pushdown (a reader that defines ``pushFilters`` fails analysis when
    ``spark.sql.python.filterPushdown.enabled`` is false, and external
    sessions may not carry our session defaults — the conf is
    runtime-settable)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WarcDataSource)
