"""URL canonicalization + validity filters (vectorized, with exact scalar twin).

Semantics extracted from the reference (NOT copied — re-derived and
re-expressed batch-first):

- normalize: urljoin to absolute, http(s) only, drop fragment, lowercase
  scheme+netloc, strip trailing slash except root
  (reference: worker/src/crawler/parsing/link_extractor.py:85-120).
- link validity: scheme+netloc required, http(s) only, skip binary file
  extensions, length <= 2000 (link_extractor.py:122-160, ext set :16-20).
- fetch validity: length <= 2048, netloc without '..', no
  javascript:/data:/file: substring, reject private/loopback/reserved IPs
  (worker/src/crawler/core/html_downloader.py:292-327).

Two implementations:
- ``normalize_url`` / ``is_valid_link`` / ``is_valid_fetch_url`` — scalar,
  built on urllib.parse; used by the conformance oracle and as the fallback.
- ``normalize_series`` / ``valid_link_mask`` / ``valid_fetch_mask`` —
  pandas-vectorized over whole batches; rows with rare hard syntax
  (path params ';', relative '..' joins, IP hosts) fall back to the scalar
  twin, so vector == scalar everywhere by construction (fuzz-tested).
"""

from __future__ import annotations

import ipaddress
import re
from urllib.parse import urljoin, urlparse, urlunparse

import numpy as np
import pandas as pd

SKIP_EXTENSIONS = (
    ".pdf", ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx",
    ".zip", ".rar", ".tar", ".gz", ".jpg", ".jpeg", ".png", ".gif",
    ".mp3", ".mp4", ".avi", ".mov", ".wmv", ".flv", ".webm",
)

_BAD_SUBSTRINGS = ("javascript:", "data:", "file:")


# ---------------------------------------------------------------------------
# Scalar twins (oracle-exact)
# ---------------------------------------------------------------------------

def normalize_url(url: str, base: str | None = None) -> str | None:
    """Absolute-ize + normalize one URL; None if non-http(s) or unparseable."""
    try:
        if base is not None:
            url = urljoin(base, url.strip())
        parsed = urlparse(url)
        if parsed.scheme not in ("http", "https"):
            return None
        parsed = parsed._replace(fragment="")
        if parsed.hostname:
            parsed = parsed._replace(netloc=parsed.netloc.lower())
        path = parsed.path
        if path and path != "/" and path.endswith("/"):
            parsed = parsed._replace(path=path[:-1])
        return urlunparse(parsed)
    except (ValueError, AttributeError):
        return None


def is_valid_link(url: str) -> bool:
    """Link-extraction filter: crawlable http(s) URL, no binary extension."""
    try:
        parsed = urlparse(url)
        if not parsed.scheme or not parsed.netloc:
            return False
        if parsed.scheme not in ("http", "https"):
            return False
        path = parsed.path.lower()
        if path.endswith(SKIP_EXTENSIONS):
            return False
        if len(url) > 2000:
            return False
        return True
    except ValueError:
        return False


def _is_private_host(hostname: str) -> bool:
    try:
        ip = ipaddress.ip_address(hostname)
    except ValueError:
        return False
    return ip.is_private or ip.is_loopback or ip.is_reserved


def is_valid_fetch_url(url: str) -> bool:
    """Fetch-time validity filter (applied before download)."""
    try:
        if len(url) > 2048:
            return False
        parsed = urlparse(url)
        if not parsed.scheme or not parsed.netloc:
            return False
        if parsed.scheme not in ("http", "https"):
            return False
        if ".." in parsed.netloc:
            return False
        low = url.lower()
        if any(p in low for p in _BAD_SUBSTRINGS):
            return False
        if _is_private_host(parsed.netloc.split(":")[0]):
            return False
        return True
    except ValueError:
        return False


def url_host(url: str) -> str:
    try:
        return urlparse(url).netloc.lower()
    except ValueError:
        return ""


# ---------------------------------------------------------------------------
# Vectorized batch path
# ---------------------------------------------------------------------------

_ABS_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")
_HARD_RE = re.compile(r";|%|\.\./|/\.(?:/|$)")  # path params / escapes / dot segments
_IPISH_RE = re.compile(r"^[\d:.\[\]]+(?::\d+)?$")


def normalize_series(urls: pd.Series, bases: pd.Series | None = None) -> pd.Series:
    """Vectorized ``normalize_url`` over a Series (None → pd.NA result).

    Fast path handles absolute http(s) URLs and simple root-relative joins;
    anything syntactically unusual is routed through the scalar twin.
    """
    urls = urls.astype("string")
    n = len(urls)
    if n == 0:
        return urls
    if bases is not None:
        urls = urls.str.strip()
        bases = bases.astype("string")
        is_abs = urls.str.match(_ABS_RE.pattern, na=False)
        root_rel = urls.str.startswith("/") & ~urls.str.startswith("//")
        # simple join: base scheme://host + root-relative path
        base_origin = bases.str.extract(r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", expand=False)
        joined = urls.copy()
        joined = joined.mask(root_rel & base_origin.notna(), base_origin + urls)
        hard = ~(is_abs | (root_rel & base_origin.notna()))
        if hard.any():
            joined.loc[hard] = [
                urljoin(b if isinstance(b, str) else "", u if isinstance(u, str) else "")
                for u, b in zip(urls[hard], bases[hard])
            ]
        urls = joined

    out = pd.Series(pd.NA, index=urls.index, dtype="string")
    scheme = urls.str.extract(r"^([A-Za-z][A-Za-z0-9+.-]*)://", expand=False).str.lower()
    ok = scheme.isin(["http", "https"]) & urls.notna()
    # odd leading chars (whitespace etc.) before an otherwise-plausible URL:
    # urlparse tolerates some of these — route through the scalar twin.
    odd = urls.notna() & ~ok & urls.str.contains("://", regex=False, na=False)
    if odd.any():
        out.loc[odd] = pd.array([normalize_url(x) for x in urls[odd]], dtype="string")
    if not ok.any():
        return out
    u = urls[ok]
    rest = u.str.replace(r"^[A-Za-z][A-Za-z0-9+.-]*://", "", regex=True)
    rest = rest.str.split("#").str[0]  # drop fragment
    netloc = rest.str.extract(r"^([^/?]*)", expand=False)
    tail = rest.str.replace(r"^[^/?]*", "", regex=True)  # '' or starts with / or ?
    has_q = tail.str.contains("?", regex=False, na=False)
    path = tail.where(~has_q, tail.str.split("?", n=1).str[0])
    query = tail.str.split("?", n=1).str[1].where(has_q, "")
    # strip trailing slash except root
    strip = (path.str.len() > 1) & path.str.endswith("/")
    path = path.mask(strip, path.str.slice(0, -1))
    rebuilt = scheme[ok] + "://" + netloc.str.lower() + path
    rebuilt = rebuilt.where(~(has_q & (query.str.len() > 0)), rebuilt + "?" + query)
    # bare '?' with empty query is dropped (urlunparse behavior)
    out.loc[ok] = rebuilt

    # hard cases → scalar twin (params ';', escapes, dot segments, odd netloc)
    hard = ok & (urls.str.contains(_HARD_RE.pattern, regex=True, na=False))
    if hard.any():
        out.loc[hard] = pd.array([normalize_url(x) for x in urls[hard]], dtype="string")
    return out


def valid_link_mask(urls: pd.Series) -> np.ndarray:
    """Vectorized ``is_valid_link`` over already-normalized http(s) URLs."""
    urls = urls.astype("string")
    notna = urls.notna()
    scheme_ok = urls.str.match(r"^https?://", na=False)
    netloc = urls.str.extract(r"^https?://([^/?#]+)", expand=False)
    netloc_ok = netloc.notna() & (netloc.str.len() > 0)
    path = urls.str.replace(r"^https?://[^/?#]*", "", regex=True).str.split("?").str[0].str.lower()
    ext_bad = path.str.endswith(SKIP_EXTENSIONS, na=False)
    len_ok = urls.str.len() <= 2000
    return (notna & scheme_ok & netloc_ok & ~ext_bad & len_ok).fillna(False).to_numpy(dtype=bool)


def valid_fetch_mask(urls: pd.Series) -> np.ndarray:
    """Vectorized ``is_valid_fetch_url``; IP-looking hosts go to the scalar twin."""
    urls = urls.astype("string")
    low = urls.str.lower()
    scheme_ok = urls.str.match(r"^https?://", na=False)
    netloc = urls.str.extract(r"^https?://([^/?#]+)", expand=False)
    netloc_ok = netloc.notna() & (netloc.str.len() > 0) & ~netloc.str.contains("..", regex=False, na=False)
    len_ok = urls.str.len() <= 2048
    bad_sub = low.str.contains("javascript:", regex=False, na=False)
    for p in ("data:", "file:"):
        bad_sub |= low.str.contains(p, regex=False, na=False)
    mask = (scheme_ok & netloc_ok & len_ok & ~bad_sub).fillna(False)
    ipish = mask & netloc.str.match(_IPISH_RE.pattern, na=False)
    if ipish.any():
        mask.loc[ipish] = [not _is_private_host(h.split(":")[0]) for h in netloc[ipish]]
    return mask.to_numpy(dtype=bool)


def host_series(urls: pd.Series) -> pd.Series:
    """Vectorized netloc extraction (lowercased)."""
    return urls.astype("string").str.extract(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", expand=False).str.lower().fillna("")
