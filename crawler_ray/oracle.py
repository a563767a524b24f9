"""Single-threaded reference-semantics oracle (SURVEY.md §5).

The reference repo ships no tests, so conformance is defined against this
interpreter: a straight-line, obviously-correct implementation of the rules
in ``crawler_ray.semantics`` over the synthetic web. The Ray engine must
produce the identical URL-seen set, crawl order, DLQ, parsed pages, and
store table (captions byte-equal, phash equal; image bytes checked by the
PSNR gate in tests).

Pipeline modeled (worker.py:348-456 process_url + master.py:64-131 dispatch,
re-expressed as BFS waves with the deterministic total order of
semantics.py):

    wave k frontier → canonicalize → valid-link → relevance(extracted only)
    → robots → dedup(first-wins, enqueue order) → priority(−1 drop)
    → sort (priority, host_shard, seq) → politeness schedule → fetch
    → parse/store | DLQ → extracted links = wave k+1 candidates
"""

from __future__ import annotations

import json
from collections import defaultdict

from crawler_ray import geo, semantics
from crawler_ray.hashing import xxh64
from crawler_ray.imaging import decode_png, phash64
from crawler_ray.sources.synthetic_web import (
    WebParams,
    image_bytes,
    render_html,
    response_headers,
)
from crawler_ray.urlnorm import is_valid_fetch_url, is_valid_link, normalize_url, url_host


def extract_page_links(out_links: list[str], base_url: str) -> list[str]:
    """normalize → valid-link filter → first-occurrence dedup (M2-M4)."""
    seen_local: set[str] = set()
    out = []
    for raw in out_links:
        u = normalize_url(raw, base_url)
        if not u or not is_valid_link(u):
            continue
        if u in seen_local:
            continue
        seen_local.add(u)
        out.append(u)
    return out


def run_oracle(web: dict, params: WebParams, cfg: semantics.CrawlConfig | None = None) -> dict:
    cfg = cfg or semantics.CrawlConfig(max_retries=params.max_retries)
    pages_by_url = {r["url"]: r for r in web["pages"].to_pylist()}
    robots_by_host = {r["host"]: r for r in web["robots"].to_pylist()}
    images_by_id = {r["image_id"]: r for r in web["images"].to_pylist()}
    city_state = geo.city_state_map(params.n_hosts)
    state_region = geo.STATE_REGION

    seen: dict[str, int] = {}
    listing_counter = 0
    order_records, dlq, store, pages_out, sched = [], [], [], [], []

    seeds = sorted(web["seeds"].to_pylist(), key=lambda r: r["seq"])
    # candidates: (seq_key, base_url|None, url, source); extracted URLs are
    # already canonical (normalized at extraction, like the reference)
    candidates = [(int(r["seq"]), None, r["url"], "seed") for r in seeds]
    retries: list[dict] = []   # cross-wave re-enqueues (SURVEY §4 retry row)
    wave = 0
    while (candidates or retries) and wave < cfg.max_waves:
        enq = []
        for seqk, base, raw, source in sorted(candidates, key=lambda c: (c[0], c[2])):
            url = normalize_url(raw, base) if source == "seed" else raw
            if not url:
                continue
            if source != "seed" and not semantics.is_relevant_url(url):
                continue
            host = url_host(url)
            if not semantics.robots_allowed(semantics.url_path(url), robots_by_host.get(host)):
                continue
            if url in seen:
                continue
            pri, listing_counter = semantics.assign_priority(url, city_state, state_region, listing_counter)
            if pri == -1:
                continue
            seen[url] = xxh64(url)
            enq.append(
                dict(url=url, host=host, priority=pri, seq=seqk, source=source,
                     host_shard=semantics.host_shard(xxh64(host)),
                     prior_attempts=0, n_enq=0)
            )
        # re-enqueued URLs keep their original (priority, host_shard, seq)
        # key and bypass relevance/robots/seen/priority (already admitted;
        # in particular the listing RR counter must NOT advance again)
        enq.extend(retries)
        retries = []
        if not enq:
            break
        ordered = sorted(enq, key=lambda r: (r["priority"], r["host_shard"], r["seq"], r["url"]))
        host_count: dict[str, int] = defaultdict(int)
        next_candidates = []
        for oi, r in enumerate(ordered):
            url = r["url"]
            order_records.append(
                dict(url=url, wave=wave, priority=r["priority"], host_shard=r["host_shard"], seq=r["seq"])
            )
            delay = semantics.politeness_delay(robots_by_host.get(r["host"]), cfg.min_request_interval)
            sched.append(dict(url=url, wave=wave, host=r["host"], scheduled_at=host_count[r["host"]] * delay))
            host_count[r["host"]] += 1
            if not is_valid_fetch_url(url):
                dlq.append(dict(url=url, failed_step="invalid_url", retry_count=0, wave=wave))
                continue
            meta = pages_by_url.get(url)
            ok, step, attempts, html = semantics.fetch_decision(
                meta, render_html, cfg.max_retries, r["prior_attempts"])
            total_attempts = r["prior_attempts"] + attempts
            if not ok:
                dlq.append(dict(url=url, failed_step=step, retry_count=total_attempts - 1, wave=wave))
                if semantics.retryable_step(step) and r["n_enq"] < cfg.max_enqueue_retries:
                    retries.append(dict(r, prior_attempts=total_attempts, n_enq=r["n_enq"] + 1))
                continue
            content_hash = xxh64(html)
            if meta["kind"] == "property":
                day = int(meta["posted_days"])
                pages_out.append(
                    dict(
                        url=url, url_hash=seen[url], host=r["host"],
                        host_shard=r["host_shard"],
                        crawl_duration=meta["latency_ms"] / 1000.0,
                        caption=meta["caption"], title=meta["title"],
                        address=meta["address"], price=meta["price"],
                        latitude=meta["latitude"], longitude=meta["longitude"],
                        property_type="apartment", beds=meta["beds"], baths=meta["baths"],
                        sqft=meta["sqft"],
                        posted_date=f"2025-{1 + day // 31:02d}-{1 + day % 28:02d}T{day % 24:02d}:00:00",
                        city=meta["city"], status_code=200, content_hash=content_hash, wave=wave,
                        headers=json.dumps(response_headers(url, len(html)), sort_keys=True),
                    )
                )
                for iid in meta["img_ids"]:
                    im = images_by_id[iid]
                    data = image_bytes(iid, im["w"], im["h"], im["fmt"], cfg.seed)
                    store.append(
                        dict(image_id=iid, w=im["w"], h=im["h"], fmt=im["fmt"],
                             caption=meta["caption"], phash=phash64(decode_png(data)),
                             host=r["host"], host_shard=r["host_shard"], wave=wave, src_url=url)
                    )
            for pos, link in enumerate(extract_page_links(meta["out_links"], url)):
                next_candidates.append((semantics.child_seq(seen[url], pos), url, link, "extracted"))
        candidates = next_candidates
        wave += 1

    return dict(
        seen={u: h for u, h in seen.items()},
        order=order_records,
        dlq=dlq,
        pages=pages_out,
        store=store,
        schedule=sched,
        waves=wave,
    )
