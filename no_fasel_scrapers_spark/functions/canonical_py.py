"""Python twin of functions/canonical.py (driver-side / oracle use only).

The engine's hot path uses the pure-column version; this twin exists for
(a) seed preparation on the driver, (b) the deterministic fixture generator
(pages are keyed by canonical URL), and (c) the single-threaded ordering
oracle.  tests/test_canonical.py property-checks both implementations agree
byte-for-byte so neither can drift.
"""

from __future__ import annotations

import re

TRACKING_PARAM_RE = re.compile(r"^(utm_[^=]*|fbclid|gclid|msclkid|igshid|ref|ref_src)(=.*)?$")
_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://")


def canonicalize_url(url: str) -> str:
    m = _SCHEME_RE.match(url)
    scheme = m.group(1).lower() if m else "https"
    rest = _SCHEME_RE.sub("", url, count=1)
    authority = re.match(r"^([^/?#]*)", rest).group(1)
    host_port = re.sub(r"^.*@", "", authority).lower()
    host = re.sub(r":\d*$", "", host_port)
    pm = re.search(r":(\d+)$", host_port)
    port = pm.group(1) if pm else ""
    keep_port = port != "" and not (
        (scheme == "http" and port == "80")
        or (scheme == "https" and port == "443")
    )
    authority_c = f"{host}:{port}" if keep_port else host

    path_and_query = re.sub(r"#.*$", "", rest[len(authority):], count=1)
    path = re.match(r"^([^?]*)", path_and_query).group(1)
    path = re.sub(r"/{2,}", "/", path)
    path = re.sub(r"^(.+?)/+$", r"\1", path)
    if path == "":
        path = "/"

    qm = re.search(r"\?(.*)$", path_and_query)
    q = qm.group(1) if qm else ""
    kept = sorted(
        p for p in q.split("&") if p != "" and not TRACKING_PARAM_RE.match(p)
    )
    qs = "&".join(kept)
    return f"{scheme}://{authority_c}{path}" + (f"?{qs}" if qs else "")


def host_of(url: str) -> str:
    rest = _SCHEME_RE.sub("", url, count=1)
    authority = re.match(r"^([^/?#]*)", rest).group(1)
    host_port = re.sub(r"^.*@", "", authority).lower()
    return re.sub(r":\d*$", "", host_port)
