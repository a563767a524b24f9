"""Deterministic synthetic web (FIXTURES.md F1–F4) — the simulated network.

There is no network in the sandbox (SURVEY.md §7), so the "web" is a seeded,
reproducible host/page/link/image graph shaped like the reference's target
site grammar (worker/src/crawler/utils/property_matcher.py:10-26):

- listing page:  ``https://{city}.craigslist.org/search/apa[?page=N]``
- property page: ``https://{city}.craigslist.org/apa/d/{slug}/{pid}.html``

The web is FUNCTIONAL: ``page_meta(url, params)`` derives a page's complete
metadata (fields, out-links, failure flags, image refs) from
``xxh64(seed, url)``-seeded RNG — no global state, no lookup table. Fetch
workers therefore need only the (tiny) ``WebParams`` to simulate the
network; nothing web-sized is ever broadcast, exactly like a real crawler
whose "state" is the network itself. ``build_web`` materializes the same
function over all URLs for the oracle and tests.

Failure injection (html_downloader.py retry semantics, :172-217):
- ``status_code`` + ``fail_attempts``: attempts < fail_attempts observe
  ``status_code``; later attempts observe 200 (transient-failure path,
  cumulative ACROSS waves via the DLQ re-enqueue — semantics.fetch_decision).
- ``blocked``: HTML contains one of the 12 block indicators on every attempt
  (detected from the rendered content, like the reference's _is_blocked).
- ``short``: HTML is < 5000 chars on every attempt.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from crawler_ray import geo
from crawler_ray.hashing import xxh64
from crawler_ray.imaging import encode_png, encode_qpng

# block pages embed one of semantics.BLOCK_INDICATORS (all 12 exercised,
# chosen deterministically per URL — see render_html)
_FILLER_WORDS = (
    "spacious bright modern renovated cozy charming quiet sunny updated "
    "hardwood granite stainless laundry parking balcony garden rooftop gym "
    "transit downtown walkable pets welcome utilities included available now"
).split()

_PROP_RE = re.compile(r"^https://([a-z0-9]+)\.craigslist\.org/apa/d/([^/]+)/(\d+)\.html$")
_LIST_RE = re.compile(r"^https://([a-z0-9]+)\.craigslist\.org/search/apa(?:\?page=(\d+))?$")

_PID_BASE = 7_000_000_000


@dataclass(frozen=True)
class WebParams:
    seed: int = 42
    n_hosts: int = 30
    props_per_host: int = 40
    hot_hosts: int = 2
    hot_factor: int = 20
    props_per_listing: int = 12
    img_per_prop_max: int = 3
    lossy_frac: float = 0.2
    fail_frac: float = 0.08       # pages with transient/permanent status failures
    blocked_frac: float = 0.02
    short_frac: float = 0.02
    max_retries: int = 3
    content_rev: int = 0          # bumping changes ~25% of property pages'
                                  # content (urls/links stable) — the
                                  # incremental-recrawl fixture knob


def content_changes(url: str, p: WebParams) -> bool:
    """Whether this property URL's content differs from content_rev=0."""
    return p.content_rev != 0 and xxh64(f"chg:{url}") % 4 == 0


def unit_params(seed: int = 42) -> WebParams:
    return WebParams(seed=seed, n_hosts=3, props_per_host=5, hot_hosts=0, props_per_listing=4)


def conformance_params(seed: int = 42) -> WebParams:
    return WebParams(seed=seed)


def bench_params(seed: int = 42, n_hosts: int = 30, props_per_host: int = 150) -> WebParams:
    """Throughput tier: shallow + wide (one listing page covers 150 props →
    few waves with thousands of fetches each, so per-wave fixed costs
    amortize and the fetch/parse/store stages dominate wall-clock)."""
    return WebParams(seed=seed, n_hosts=n_hosts, props_per_host=props_per_host,
                     hot_hosts=3, hot_factor=8, props_per_listing=150)


def _rng(*key) -> np.random.Generator:
    return np.random.default_rng(xxh64(":".join(str(k) for k in key)))


def _image_id(img_url: str) -> str:
    # reference naming: hex digest prefix of the source URL (file_storage.py:286)
    return hashlib.sha256(img_url.encode()).hexdigest()[:16]


def _host_index(p: WebParams) -> dict[str, int]:
    return {f"{c}.craigslist.org": i for i, c in enumerate(geo.city_list(p.n_hosts))}


def _n_props(p: WebParams, hi: int) -> int:
    return p.props_per_host * (p.hot_factor if hi < p.hot_hosts else 1)


def _n_listings(p: WebParams, hi: int) -> int:
    return max(1, -(-_n_props(p, hi) // p.props_per_listing))


def _slug(p: WebParams, hi: int, j: int) -> str:
    r = _rng("slug", p.seed, hi, j)
    w1 = _FILLER_WORDS[int(r.integers(0, len(_FILLER_WORDS)))]
    w2 = _FILLER_WORDS[int(r.integers(0, len(_FILLER_WORDS)))]
    disallowed = r.random() < 0.05
    return f"{'no-' if disallowed else ''}{w1}-{w2}-{j}"


def _prop_url(p: WebParams, host: str, hi: int, j: int) -> str:
    return f"https://{host}/apa/d/{_slug(p, hi, j)}/{_PID_BASE + hi * 1_000_000 + j}.html"


def _listing_url(host: str, li: int) -> str:
    return f"https://{host}/search/apa" + (f"?page={li + 1}" if li else "")


def _failure_flags(p: WebParams, url: str) -> dict:
    """Failure injection. ``fail_attempts`` spans three tiers against the
    per-wave attempt budget B = max_retries+1 and the cross-wave cap
    (1 + max_enqueue_retries) re-enqueues: [1, B] succeed in-wave or after
    one re-enqueue, (B, 3B] need 1–2 re-enqueues, > 3B are permanent — so
    every branch of the DLQ re-enqueue path is exercised."""
    r = _rng("fail", p.seed, url)
    out = dict(status_code=200, fail_attempts=0, blocked=False, short=False,
               latency_ms=int(r.integers(20, 400)))
    if r.random() < p.fail_frac:
        out["status_code"] = int(r.choice([403, 429, 500, 503]))
        budget = p.max_retries + 1
        tier = r.random()
        if tier < 0.5:
            out["fail_attempts"] = int(r.integers(1, budget + 1))
        elif tier < 0.85:
            out["fail_attempts"] = int(r.integers(budget + 1, 3 * budget + 1))
        else:
            out["fail_attempts"] = int(3 * budget + r.integers(1, 5))
    out["blocked"] = bool(r.random() < p.blocked_frac)
    out["short"] = bool(r.random() < p.short_frac)
    return out


_SERVERS = ("nginx", "apache", "cloudfront", "envoy")


def response_headers(url: str, html_len: int) -> dict[str, str]:
    """Deterministic response headers for a fetched page — the transport
    metadata the reference persists as JSONB (database_service.py:45-66).
    Stored on pages as a sorted-key JSON string column."""
    srv = _SERVERS[xxh64("srv:" + url) % len(_SERVERS)]
    return {"content-length": str(html_len),
            "content-type": "text/html; charset=utf-8",
            "server": srv}


def image_meta(img_url: str, p: WebParams) -> dict:
    """Image metadata derived from the URL (the 'image server')."""
    r = _rng("imgmeta", p.seed, img_url)
    return dict(
        image_id=_image_id(img_url), img_url=img_url,
        w=int(r.choice([48, 64, 96])), h=int(r.choice([48, 64, 96])),
        fmt="qpng" if r.random() < p.lossy_frac else "png",
    )


def page_meta(url: str, p: WebParams, host_index: dict[str, int] | None = None) -> dict | None:
    """Derive a page's full metadata from (seed, url); None if the page
    doesn't exist (404). Pure function — the whole web follows from it."""
    hidx = host_index if host_index is not None else _host_index(p)
    m = _PROP_RE.match(url)
    if m:
        city, slug, pid = m.group(1), m.group(2), int(m.group(3))
        host = f"{city}.craigslist.org"
        hi = hidx.get(host)
        if hi is None:
            return None
        j = pid - _PID_BASE - hi * 1_000_000
        if not (0 <= j < _n_props(p, hi)) or _slug(p, hi, j) != slug:
            return None
        rev = p.content_rev if content_changes(url, p) else 0
        r = _rng("prop", p.seed, hi, j, rev)
        word = _FILLER_WORDS[int(r.integers(0, len(_FILLER_WORDS)))]
        beds = int(r.integers(0, 5))
        base_lon = geo.STATE_LONGITUDE[geo.city_state_map(p.n_hosts)[city]]
        n_img = int(r.integers(1, p.img_per_prop_max + 1))
        img_urls = [f"https://images.craigslist.org/{pid}_{k}.jpg" for k in range(n_img)]
        caption = (
            f"Caption for {slug} #{pid}: "
            + " ".join(_FILLER_WORDS[i] for i in r.integers(0, len(_FILLER_WORDS), 12))
        )
        # out-links: a few same-host peers + listing backlink
        k = int(r.integers(1, 4))
        peers = [int(x) for x in r.integers(0, _n_props(p, hi), k)]
        links = [_prop_url(p, host, hi, pj) for pj in peers if pj != j]
        links.append(f"https://{host}/search/apa")
        return dict(
            url=url, host=host, city=city, kind="property", page_id=pid, slug=slug,
            title=f"{beds}br {word} in {city}",
            address=f"{int(r.integers(1, 9999))} {word} st, {city}",
            price=int(r.integers(500, 5001)),
            latitude=round(34.0 + float(r.normal(0, 3)), 6),
            longitude=round(base_lon + float(r.normal(0, 1)), 6),
            beds=beds, baths=float(int(r.integers(2, 8))) / 2.0,
            sqft=int(r.integers(300, 2501)),
            posted_days=int(r.integers(0, 365)),
            caption=caption, img_urls=img_urls,
            img_ids=[_image_id(u) for u in img_urls],
            out_links=links, **_failure_flags(p, url),
        )

    m = _LIST_RE.match(url)
    if m:
        city = m.group(1)
        li = int(m.group(2)) - 1 if m.group(2) else 0
        host = f"{city}.craigslist.org"
        hi = hidx.get(host)
        if hi is None or not (0 <= li < _n_listings(p, hi)):
            return None
        r = _rng("listing", p.seed, hi, li)
        n_props = _n_props(p, hi)
        n_listings = _n_listings(p, hi)
        links: list[str] = []
        for j in range(li * p.props_per_listing, min((li + 1) * p.props_per_listing, n_props)):
            u = _prop_url(p, host, hi, j)
            variant = int(r.integers(0, 5))
            if variant == 1:
                links.append(u + "#gallery")                 # fragment → normalized away
            elif variant == 2:
                links.append("/" + u.split("/", 3)[3])       # root-relative
            elif variant == 3:
                links.append(u.replace(host, host.upper()))  # case variant → same canonical
            else:
                links.append(u)
            if r.random() < 0.15:
                links.append(u)                               # duplicate
        # pagination bar: every listing page links every other page (keeps
        # the BFS shallow — all listings discovered by wave 1)
        for lj in range(n_listings):
            if lj != li:
                links.append(_listing_url(host, lj))
        if li == 0 and n_listings > 1:
            links.append(f"https://{host}/search/apa?page=2#top")
        hosts = [f"{c}.craigslist.org" for c in geo.city_list(p.n_hosts)]
        links.append(f"https://{hosts[int(r.integers(0, len(hosts)))]}/search/apa")
        # junk links (filtered by M1/M3/relevance)
        links += [
            "javascript:void(0)",
            f"https://{host}/about/help",
            f"https://{host}/img/banner.jpg",
            "https://www.example-apartments.com/listings",
            "https://unknowncity.craigslist.org/search/apa",
            f"https://{host}/apa/" + "x" * 2100 + ".html",
        ]
        return dict(
            url=url, host=host, city=city, kind="listing", page_id=0, slug="",
            title=f"apartments in {city}", address="", price=0, latitude=0.0,
            longitude=0.0, beds=0, baths=0.0, sqft=0, posted_days=0, caption="",
            img_urls=[], img_ids=[], out_links=links, **_failure_flags(p, url),
        )
    return None


def robots_for_host(host: str, p: WebParams) -> dict:
    r = _rng("robots", p.seed, host)
    roll = r.random()
    fetch_status = 200 if roll < 0.8 else (404 if roll < 0.93 else 500)
    disallow = ["/apa/d/no-"] if r.random() < 0.5 else []
    delay = float(r.choice([0.0, 1.0, 2.0, 5.0]))
    return dict(host=host, disallow_prefixes=disallow,
                crawl_delay_s=(delay if delay > 0 else None), fetch_status=fetch_status)


def all_urls(p: WebParams):
    hidx = _host_index(p)
    for host, hi in hidx.items():
        for li in range(_n_listings(p, hi)):
            yield _listing_url(host, li)
        for j in range(_n_props(p, hi)):
            yield _prop_url(p, host, hi, j)


def build_web_control(p: WebParams) -> dict[str, pa.Table]:
    """Only the control tables (robots, seeds) — what ``run_crawl`` actually
    consumes. The page/image content is the functional web, derived on
    demand inside workers; bench setup never materializes it."""
    hidx = _host_index(p)
    robots = pa.Table.from_pylist([robots_for_host(h, p) for h in hidx])
    seed_urls = [f"https://{h}/search/apa" for h in hidx]
    order = _rng("seeds", p.seed).permutation(len(seed_urls))
    seeds = pa.Table.from_pylist(
        [{"url": seed_urls[i], "seq": int(s)} for s, i in enumerate(order)]
    )
    return {"robots": robots, "seeds": seeds}


def build_web(p: WebParams) -> dict[str, pa.Table]:
    """Materialize the functional web into the fixture tables ``pages``
    (F1), ``robots`` (F2), ``seeds`` (F3), ``images`` (F4 metadata)."""
    hidx = _host_index(p)
    rows = [page_meta(u, p, hidx) for u in all_urls(p)]
    pages = pa.Table.from_pylist(rows)
    robots = pa.Table.from_pylist([robots_for_host(h, p) for h in hidx])
    seed_urls = [f"https://{h}/search/apa" for h in hidx]
    order = _rng("seeds", p.seed).permutation(len(seed_urls))
    seeds = pa.Table.from_pylist(
        [{"url": seed_urls[i], "seq": int(s)} for s, i in enumerate(order)]
    )
    img_rows = []
    for r in rows:
        for u in r["img_urls"]:
            img_rows.append(image_meta(u, p))
    images = pa.Table.from_pylist(img_rows) if img_rows else pa.Table.from_pylist(
        [], schema=pa.schema([("image_id", pa.string()), ("img_url", pa.string()),
                              ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string())])
    )
    return {"pages": pages, "robots": robots, "seeds": seeds, "images": images}


# ---------------------------------------------------------------------------
# On-demand payload rendering (the "network")
# ---------------------------------------------------------------------------

def render_html(meta: dict) -> str:
    """Render a page's HTML deterministically from its metadata row.

    Embeds exactly the patterns the reference parser extracts
    (craigslist_parser.py:52-191) and the raw ``out_links`` as <a href>.
    """
    links_html = "\n".join(f'<li><a href="{u}">{u[:60]}</a></li>' for u in meta["out_links"])
    if meta["kind"] == "property":
        day = int(meta["posted_days"])
        posted = f"2025-{1 + day // 31:02d}-{1 + day % 28:02d}T{day % 24:02d}:00:00+00:00"
        imgs = "\n".join(f'<img src="{u}">' for u in meta["img_urls"])
        body = f"""
<h1 class="postingtitle"><span id="titletextonly">{meta['title']}</span></h1>
<span class="price">${meta['price']:,}</span>
<div id="mapbox" data-latitude="{meta['latitude']}" data-longitude="{meta['longitude']}">
  <div class="mapaddress">{meta['address']}</div>
</div>
<span class="shared-line-bubble"><b>{meta['beds']}br</b> / <b>{meta['baths']}ba</b> / <b>{meta['sqft']}ft2</b></span>
<time class="date" datetime="{posted}">posted</time>
<section id="postingbody">{meta['caption']}</section>
<figure class="gallery">{imgs}</figure>
"""
    else:
        body = f'<h1 class="searchtitle">{meta["title"]}</h1>'
    if meta["blocked"]:
        from crawler_ray.semantics import BLOCK_INDICATORS

        ind = BLOCK_INDICATORS[xxh64("blockind:" + meta["url"]) % len(BLOCK_INDICATORS)]
        block = f"<p>{ind} notice</p>"
    else:
        block = ""
    html = f"""<!DOCTYPE html>
<html><head><title>{meta['title']} - craigslist</title></head>
<body>{block}
{body}
<ul class="links">
{links_html}
</ul>
"""
    if not meta["short"]:
        # deterministic filler so real pages exceed the 5000-char floor
        pad = " ".join(_FILLER_WORDS[(i * 7) % len(_FILLER_WORDS)] for i in range(900))
        html += f"<footer><p>{pad}</p></footer>"
    html += "</body></html>"
    if meta["short"]:
        html = html[:3000]
    return html


def image_array(image_id: str, w: int, h: int, seed: int = 42) -> np.ndarray:
    """Deterministic RGB pixels for an image id: per-image seeded
    low-frequency structure (random 4×4 coarse pattern upsampled) + noise,
    so distinct images have well-separated phashes while near-identical
    re-encodes stay close."""
    sub = np.random.default_rng((int(image_id, 16) ^ seed) & 0x7FFFFFFFFFFFFFFF)
    coarse = sub.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    up = np.repeat(np.repeat(coarse, -(-h // 4), axis=0), -(-w // 4), axis=1)[:h, :w]
    noise = sub.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return ((up.astype(np.uint16) * 3 + noise) // 4).astype(np.uint8)


def image_bytes(image_id: str, w: int, h: int, fmt: str, seed: int = 42) -> bytes:
    arr = image_array(image_id, w, h, seed)
    if fmt == "png":
        return encode_png(arr)
    if fmt == "qpng":
        return encode_qpng(arr, q=6)
    raise ValueError(f"unknown fmt {fmt}")
