"""Deterministic synthetic web (FIXTURES.md F1–F4) — the simulated network.

There is no network in the sandbox (SURVEY.md §7), so the "web" is a seeded,
reproducible host/page/link/image graph shaped like the reference's target
site grammar (worker/src/crawler/utils/property_matcher.py:10-26):

- listing page:  ``https://{city}.craigslist.org/search/apa[?page=N]``
- property page: ``https://{city}.craigslist.org/apa/d/{slug}/{id}.html``

Everything is derived from one integer seed via ``numpy.random.default_rng``;
two calls with the same parameters produce byte-identical tables, HTML and
image payloads. The fetch stage "downloads" by rendering
``render_html(meta)`` on demand (so bench-scale webs don't ship megabytes of
HTML to every actor), and "downloads images" via ``image_bytes(...)``.

Failure injection (html_downloader.py retry semantics, :172-217):
- ``status_code`` + ``fail_attempts``: attempts < fail_attempts observe
  ``status_code``; later attempts observe 200 (transient-failure path).
- ``blocked``: HTML contains a block-indicator substring on every attempt.
- ``short``: HTML is < 5000 chars on every attempt.
A page is fetchable iff not blocked, not short, and
``fail_attempts <= max_retries``.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from crawler_ray import geo
from crawler_ray.imaging import encode_png, encode_qpng

BLOCK_INDICATOR = "unusual traffic"  # one of the reference's 12 indicators
_FILLER_WORDS = (
    "spacious bright modern renovated cozy charming quiet sunny updated "
    "hardwood granite stainless laundry parking balcony garden rooftop gym "
    "transit downtown walkable pets welcome utilities included available now"
).split()


@dataclass(frozen=True)
class WebParams:
    seed: int = 42
    n_hosts: int = 30
    props_per_host: int = 40
    hot_hosts: int = 2
    hot_factor: int = 20
    props_per_listing: int = 12
    link_fanout: int = 8
    img_per_prop_max: int = 3
    lossy_frac: float = 0.2
    fail_frac: float = 0.08       # pages with transient/permanent status failures
    blocked_frac: float = 0.02
    short_frac: float = 0.02
    max_retries: int = 3


def unit_params(seed: int = 42) -> WebParams:
    return WebParams(seed=seed, n_hosts=3, props_per_host=5, hot_hosts=0, props_per_listing=4)


def conformance_params(seed: int = 42) -> WebParams:
    return WebParams(seed=seed)


def bench_params(seed: int = 42, n_hosts: int = 60, props_per_host: int = 150) -> WebParams:
    return WebParams(seed=seed, n_hosts=n_hosts, props_per_host=props_per_host, hot_hosts=3, hot_factor=8)


def _image_id(img_url: str) -> str:
    # reference naming: hex digest prefix of the source URL (file_storage.py:286)
    return hashlib.sha256(img_url.encode()).hexdigest()[:16]


def build_web(p: WebParams) -> dict[str, pa.Table]:
    """Generate the fixture tables: ``pages`` (F1+property fields), ``robots``
    (F2), ``seeds`` (F3), ``images`` (F4 metadata; bytes rendered lazily)."""
    rng = np.random.default_rng(p.seed)
    cities = geo.city_list(p.n_hosts)
    city_state = geo.city_state_map(p.n_hosts)
    hosts = [f"{c}.craigslist.org" for c in cities]

    # --- per-host page counts (skew: first hot_hosts are hot_factor× hotter)
    rows: list[dict] = []
    img_rows: list[dict] = []
    for hi, (city, host) in enumerate(zip(cities, hosts)):
        n_props = p.props_per_host * (p.hot_factor if hi < p.hot_hosts else 1)
        n_listings = max(1, -(-n_props // p.props_per_listing))
        prop_urls = []
        base_lon = geo.STATE_LONGITUDE[city_state[city]]
        for j in range(n_props):
            pid = 7_000_000_000 + hi * 1_000_000 + j
            word = _FILLER_WORDS[int(rng.integers(0, len(_FILLER_WORDS)))]
            disallowed = rng.random() < 0.05
            slug = f"{'no-' if disallowed else ''}{word}-{word2(rng)}-{j}"
            url = f"https://{host}/apa/d/{slug}/{pid}.html"
            prop_urls.append(url)
            n_img = int(rng.integers(1, p.img_per_prop_max + 1))
            img_urls = [f"https://images.craigslist.org/{pid}_{k}.jpg" for k in range(n_img)]
            img_ids = [_image_id(u) for u in img_urls]
            lossy = rng.random(n_img) < p.lossy_frac
            caption = (
                f"Caption for {slug} #{pid}: "
                + " ".join(_FILLER_WORDS[i] for i in rng.integers(0, len(_FILLER_WORDS), 12))
            )
            beds = int(rng.integers(0, 5))
            rows.append(
                dict(
                    url=url, host=host, city=city, kind="property", page_id=pid,
                    slug=slug, title=f"{beds}br {word} in {city}",
                    address=f"{int(rng.integers(1, 9999))} {word} st, {city}",
                    price=int(rng.integers(500, 5001)),
                    latitude=round(34.0 + float(rng.normal(0, 3)), 6),
                    longitude=round(base_lon + float(rng.normal(0, 1)), 6),
                    beds=beds,
                    baths=float(int(rng.integers(2, 8))) / 2.0,
                    sqft=int(rng.integers(300, 2501)),
                    posted_days=int(rng.integers(0, 365)),
                    caption=caption,
                    img_urls=img_urls, img_ids=img_ids,
                    status_code=200, fail_attempts=0, blocked=False, short=False,
                    latency_ms=int(rng.integers(20, 400)),
                )
            )
            for u, iid, lo in zip(img_urls, img_ids, lossy):
                wdim = int(rng.choice([48, 64, 96]))
                hdim = int(rng.choice([48, 64, 96]))
                img_rows.append(dict(image_id=iid, img_url=u, w=wdim, h=hdim, fmt="qpng" if lo else "png"))

        # listing pages: /search/apa, /search/apa?page=2, ...
        for li in range(n_listings):
            url = f"https://{host}/search/apa" + (f"?page={li + 1}" if li else "")
            links: list[str] = []
            chunk = prop_urls[li * p.props_per_listing : (li + 1) * p.props_per_listing]
            for k, u in enumerate(chunk):
                # embed messy href variants to exercise normalization (M2/M3)
                variant = int(rng.integers(0, 5))
                if variant == 0:
                    links.append(u)
                elif variant == 1:
                    links.append(u + "#gallery")       # fragment → normalized away
                elif variant == 2:
                    links.append("/" + u.split("/", 3)[3])  # root-relative
                elif variant == 3:
                    links.append(u.replace(host, host.upper()))  # case variant → same canonical URL
                else:
                    links.append(u)
                if rng.random() < 0.15:
                    links.append(u)                     # duplicate
            if li + 1 < n_listings:
                links.append(f"https://{host}/search/apa?page={li + 2}")
            if li == 0 and n_listings > 1:
                links.append(f"https://{host}/search/apa?page=2#top")
            # cross-host link
            other = hosts[int(rng.integers(0, len(hosts)))]
            links.append(f"https://{other}/search/apa")
            # junk links (filtered by M1/M3/relevance)
            links.append("javascript:void(0)")
            links.append(f"https://{host}/about/help")
            links.append(f"https://{host}/img/banner.jpg")
            links.append("https://www.example-apartments.com/listings")
            links.append("https://unknowncity.craigslist.org/search/apa")
            links.append(f"https://{host}/apa/" + "x" * 2100 + ".html")
            rows.append(
                dict(
                    url=url, host=host, city=city, kind="listing", page_id=0,
                    slug="", title=f"apartments in {city}", address="",
                    price=0, latitude=0.0, longitude=0.0, beds=0, baths=0.0,
                    sqft=0, posted_days=0, caption="", img_urls=[], img_ids=[],
                    status_code=200, fail_attempts=0, blocked=False, short=False,
                    latency_ms=int(rng.integers(20, 400)), out_links_raw=links,
                )
            )

    # property out-links: a few same-host props + listing backlink
    by_host_props: dict[str, list[str]] = {}
    for r in rows:
        if r["kind"] == "property":
            by_host_props.setdefault(r["host"], []).append(r["url"])
    for r in rows:
        if r["kind"] == "property":
            peers = by_host_props[r["host"]]
            k = min(len(peers), int(rng.integers(1, 4)))
            idx = rng.integers(0, len(peers), k)
            links = [peers[i] for i in idx if peers[i] != r["url"]]
            links.append(f"https://{r['host']}/search/apa")
            r["out_links_raw"] = links

    # failure injection (applied uniformly over fetchable pages)
    n = len(rows)
    fail_mask = rng.random(n) < p.fail_frac
    blocked_mask = rng.random(n) < p.blocked_frac
    short_mask = rng.random(n) < p.short_frac
    statuses = rng.choice([403, 429, 500, 503], n)
    attempts = rng.integers(1, p.max_retries + 3, n)  # some within budget, some beyond
    for i, r in enumerate(rows):
        if fail_mask[i]:
            r["status_code"] = int(statuses[i])
            r["fail_attempts"] = int(attempts[i])
        r["blocked"] = bool(blocked_mask[i])
        r["short"] = bool(short_mask[i])

    pages = pa.Table.from_pylist(
        [
            {
                "url": r["url"], "host": r["host"], "city": r["city"],
                "kind": r["kind"], "page_id": r["page_id"], "slug": r["slug"],
                "title": r["title"], "address": r["address"], "price": r["price"],
                "latitude": r["latitude"], "longitude": r["longitude"],
                "beds": r["beds"], "baths": r["baths"], "sqft": r["sqft"],
                "posted_days": r["posted_days"], "caption": r["caption"],
                "img_urls": r["img_urls"], "img_ids": r["img_ids"],
                "out_links": r["out_links_raw"],
                "status_code": r["status_code"], "fail_attempts": r["fail_attempts"],
                "blocked": r["blocked"], "short": r["short"],
                "latency_ms": r["latency_ms"],
            }
            for r in rows
        ]
    )

    # robots (F2): 404/error hosts allow-all; some hosts disallow 'no-' slugs
    robots_rows = []
    for host in hosts:
        roll = rng.random()
        fetch_status = 200 if roll < 0.8 else (404 if roll < 0.93 else 500)
        disallow = ["/apa/d/no-"] if rng.random() < 0.5 else []
        delay = float(rng.choice([0.0, 1.0, 2.0, 5.0]))
        robots_rows.append(
            dict(host=host, disallow_prefixes=disallow,
                 crawl_delay_s=(delay if delay > 0 else None), fetch_status=fetch_status)
        )
    robots = pa.Table.from_pylist(robots_rows)

    # seeds (F3): every host's root listing URL, deterministically shuffled
    seed_urls = [f"https://{h}/search/apa" for h in hosts]
    order = rng.permutation(len(seed_urls))
    seeds = pa.Table.from_pylist(
        [{"url": seed_urls[i], "seq": int(s)} for s, i in enumerate(order)]
    )

    images = pa.Table.from_pylist(img_rows) if img_rows else pa.Table.from_pylist(
        [], schema=pa.schema([("image_id", pa.string()), ("img_url", pa.string()),
                              ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string())])
    )
    return {"pages": pages, "robots": robots, "seeds": seeds, "images": images}


def word2(rng) -> str:
    return _FILLER_WORDS[int(rng.integers(0, len(_FILLER_WORDS)))]


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
    block = f"<p>{BLOCK_INDICATOR} notice</p>" if meta["blocked"] else ""
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
    """Deterministic RGB pixels for an image id (seeded, structured)."""
    sub = np.random.default_rng((int(image_id, 16) ^ seed) & 0x7FFFFFFFFFFFFFFF)
    base = sub.integers(0, 256, (h, w, 3), dtype=np.uint8)
    # add smooth structure so phash is meaningful
    yy, xx = np.mgrid[0:h, 0:w]
    grad = ((xx * 255 // max(1, w - 1)) + (yy * 128 // max(1, h - 1))) % 256
    return ((base.astype(np.uint16) + grad[:, :, None]) // 2).astype(np.uint8)


def image_bytes(image_id: str, w: int, h: int, fmt: str, seed: int = 42) -> bytes:
    arr = image_array(image_id, w, h, seed)
    if fmt == "png":
        return encode_png(arr)
    if fmt == "qpng":
        return encode_qpng(arr, q=6)
    raise ValueError(f"unknown fmt {fmt}")
