"""URL normalization/validity: reference semantics + vector/scalar agreement.

Reference semantics: link_extractor.py:85-160, html_downloader.py:292-327.
"""

import numpy as np
import pandas as pd

from crawler_ray.urlnorm import (
    host_series,
    is_valid_fetch_url,
    is_valid_link,
    normalize_series,
    normalize_url,
    url_host,
    valid_fetch_mask,
    valid_link_mask,
)

BASE = "https://sfbay.craigslist.org/search/apa"


def test_normalize_reference_rules():
    # lowercase netloc, keep path case
    assert normalize_url("https://SFBay.Craigslist.ORG/Apa/D/x/123.html") == "https://sfbay.craigslist.org/Apa/D/x/123.html"
    # drop fragment
    assert normalize_url("https://x.org/a#frag") == "https://x.org/a"
    # trailing slash stripped except root
    assert normalize_url("https://x.org/a/") == "https://x.org/a"
    assert normalize_url("https://x.org/") == "https://x.org/"
    assert normalize_url("https://x.org") == "https://x.org"
    # non-http(s) → None
    assert normalize_url("ftp://x.org/a") is None
    assert normalize_url("javascript:void(0)", BASE) is None
    assert normalize_url("mailto:a@b.c", BASE) is None
    # relative joins
    assert normalize_url("/apa/d/y/9.html", BASE) == "https://sfbay.craigslist.org/apa/d/y/9.html"
    assert normalize_url("page2.html", BASE) == "https://sfbay.craigslist.org/search/page2.html"
    assert normalize_url("//cdn.x.org/y", BASE) == "https://cdn.x.org/y"
    # query preserved, bare '?' dropped
    assert normalize_url("https://x.org/a?b=1#f") == "https://x.org/a?b=1"
    assert normalize_url("https://x.org/a?") == "https://x.org/a"


def test_link_validity_reference_rules():
    assert is_valid_link("https://x.org/page")
    assert not is_valid_link("https://x.org/f.pdf")
    assert not is_valid_link("https://x.org/F.JPG".lower() + "")  # ext check is on lowered path
    assert not is_valid_link("https://x.org/a.webm")
    assert not is_valid_link("https://x.org/" + "a" * 2100)  # > 2000 chars
    assert not is_valid_link("ftp://x.org/a")
    assert not is_valid_link("/no-netloc")


def test_fetch_validity_reference_rules():
    assert is_valid_fetch_url("https://x.org/a")
    assert not is_valid_fetch_url("https://x.org/" + "a" * 2100)  # > 2048
    assert not is_valid_fetch_url("https://x..org/a")  # '..' in netloc
    assert not is_valid_fetch_url("https://x.org/a?next=javascript:alert(1)")
    assert not is_valid_fetch_url("http://10.1.2.3/a")
    assert not is_valid_fetch_url("http://127.0.0.1:8080/a")
    assert not is_valid_fetch_url("http://192.168.0.5/a")
    assert is_valid_fetch_url("http://8.8.8.8/a")


def _fuzz_urls():
    rng = np.random.default_rng(3)
    hosts = ["x.org", "A.B.ORG", "sfbay.craigslist.org", "10.0.0.9", "8.8.4.4", "x..org"]
    paths = ["", "/", "/a", "/a/", "/a/b.html", "/a/b/", "/f.pdf", "/IMG.JPG", "/a;p", "/%7Eu/", "/a/../b", "/" + "z" * 2500]
    tails = ["", "#f", "?q=1", "?", "?a=1&b=2#x", "#"]
    schemes = ["https", "http", "ftp", "HTTPS"]
    urls = []
    for _ in range(600):
        u = f"{rng.choice(schemes)}://{rng.choice(hosts)}{rng.choice(paths)}{rng.choice(tails)}"
        urls.append(u)
    urls += ["/rel", "rel.html", "../up", "#only", "", "javascript:x", "mailto:a@b", "  https://x.org/sp"]
    return urls


def test_vector_matches_scalar_fuzz():
    urls = _fuzz_urls()
    s = pd.Series(urls)
    # with base
    want = [normalize_url(u, BASE) for u in urls]
    got = [None if pd.isna(v) else v for v in normalize_series(s, pd.Series([BASE] * len(urls)))]
    assert got == want
    # without base
    want2 = [normalize_url(u) for u in urls]
    got2 = [None if pd.isna(v) else v for v in normalize_series(s)]
    assert got2 == want2
    # masks on the normalized survivors
    norm = [w for w in want if w]
    ns = pd.Series(norm)
    assert valid_link_mask(ns).tolist() == [is_valid_link(u) for u in norm]
    assert valid_fetch_mask(ns).tolist() == [is_valid_fetch_url(u) for u in norm]
    assert host_series(ns).tolist() == [url_host(u) for u in norm]
