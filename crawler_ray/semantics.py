"""Shared crawl semantics — the precise rules both the Ray engine and the
single-threaded conformance oracle implement.

The reference's behavior is a *partial* order (per-Kafka-partition FIFO,
per-process RR counters — SURVEY.md §2.9/§7). This module pins the
deterministic total-order refinement used by the rebuild:

- canonical URL  = ``urlnorm.normalize_url`` (+ validity filters M1/M3)
- relevance      = property_matcher rules (listing | property), re-derived
                   from worker/src/crawler/utils/property_matcher.py:10-58
- priority       = prioritizer rules (geospatial/prioritizer.py:150-162)
                   with the process-local round-robin counter replaced by a
                   deterministic global listing counter in enqueue order
- robots         = fixture-semantics allow rule (404/error ⇒ allow-all,
                   master/src/crawler/robots_checker.py:55-58,66-72,118-120),
                   checked for EVERY enqueue (north-rule upgrade: the
                   reference only checks seeds, master.py:80-84)
- crawl order    = within a wave, sort by (priority, host_shard, seq); seq
                   is the stable enqueue rank (parent order, link position)
- politeness     = per-host virtual spacing max(robots crawl_delay,
                   min_request_interval) (html_downloader.py:121-133 global
                   limiter upgraded to per-host per the north rule)
- fetch outcome  = html_downloader retry policy (:172-217): success iff not
                   blocked, not short, fail_attempts <= max_retries
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from crawler_ray.hashing import xxh64

NUM_SHARDS = 64               # host_shard space (partitioning key)
MIN_REQUEST_INTERVAL = 8.0    # reference config.json:9 (virtual seconds)
MAX_RETRIES = 3               # reference config.json:10
MAX_ENQUEUE_RETRIES = 2       # cross-wave re-enqueues of transient failures
                              # (SURVEY §4 upgrade: the reference silently
                              # drops URLs whose in-fetch retries exhaust,
                              # worker.py:370-372,493-496)
SHORT_CONTENT_FLOOR = 5000    # html_downloader.py:205 min_content_length

# the reference's full blocking-indicator table (html_downloader.py:255-278)
BLOCK_INDICATORS = (
    "access denied", "blocked", "captcha", "security check",
    "unusual traffic", "not available", "forbidden", "bot detected",
    "automated access", "verify you are human", "cloudflare", "please verify",
)


def is_blocked_html(html: str) -> bool:
    """Reference block-page detector: case-insensitive substring scan of the
    fetched content against the 12-indicator table."""
    low = html.lower()
    return any(ind in low for ind in BLOCK_INDICATORS)

LISTING_RE = re.compile(r"^https?://[a-z0-9\-]+\.craigslist\.org(?:/search/apa)(?:[#?].*)?$", re.IGNORECASE)
PROPERTY_RE = re.compile(r"^https?://[a-z0-9\-]+\.craigslist\.org/apa/d/[^/]+/\d+\.html$", re.IGNORECASE)


def is_listing_url(url: str) -> bool:
    return bool(LISTING_RE.match(url))


def is_property_url(url: str) -> bool:
    """Reference's loose substring-order check (property_matcher.py:43-54).
    Note: the '.html' position is the FIRST occurrence (reference uses
    find, not rfind) — a URL with '.html' before 'apa' is irrelevant."""
    low = url.lower()
    i = low.find("craigslist.org")
    if i < 0 or not low.endswith(".html"):
        return False
    j = low.find("apa")
    return 0 <= i < j < low.find(".html")


def is_relevant_url(url: str) -> bool:
    return is_listing_url(url) or is_property_url(url)


def is_listing_page(url: str) -> bool:
    """Prioritizer's looser listing test (substring /search/apa)."""
    return re.search(r"/search/apa", url, re.IGNORECASE) is not None


def host_shard(host_hash: int) -> int:
    return int(host_hash % NUM_SHARDS)


def child_seq(parent_url_hash: int, pos: int) -> int:
    """Stable enqueue-order key for an extracted link (int64, positive).

    ``(46 bits of the parent's url_hash) << 16 | link position``. This is
    intrinsic (no dense global rank ⇒ fully parallel to compute); the total
    crawl order is (wave, priority, host_shard, seq, url) — the canonical
    URL string breaks the rare truncated-hash ties deterministically.
    """
    return int(((parent_url_hash >> 16) & ((1 << 46) - 1)) << 16 | (pos & 0xFFFF))


def assign_priority(url: str, city_state: dict[str, str], state_region: dict[str, int],
                    listing_counter: int) -> tuple[int, int]:
    """(priority, new_listing_counter). −1 ⇒ drop (prioritizer.py:150-162).

    The counter increments only for known-city listing URLs that reach
    assignment (the reference's KeyError path fires before the listing
    check, so unknown-city listings never increment it).
    """
    if "craigslist.org" not in url.lower():
        return -1, listing_counter
    try:
        city = url.split("//")[1].split(".")[0]
    except IndexError:
        return -1, listing_counter
    state = city_state.get(city)
    if state is None:
        return -1, listing_counter
    region = state_region[state]
    if is_listing_page(url):
        listing_counter += 1
        return (1 if listing_counter % 2 == 0 else 2), listing_counter
    return region + 3, listing_counter


def robots_allowed(path: str, rules: dict | None) -> bool:
    """Fixture robots semantics: no rules / 404 / error ⇒ allow; else
    disallow when the path starts with any disallow prefix."""
    if rules is None or rules["fetch_status"] != 200:
        return True
    return not any(path.startswith(p) for p in rules["disallow_prefixes"])


def politeness_delay(rules: dict | None, min_interval: float = MIN_REQUEST_INTERVAL) -> float:
    delay = (rules or {}).get("crawl_delay_s") or 0.0
    return max(float(delay), min_interval)


def retryable_step(step: str) -> bool:
    """Only HTTP-status failures are transient (eligible for cross-wave
    re-enqueue); blocked/short are content-level — the content won't change
    on refetch — and invalid/not_found are structural."""
    return step.startswith("status_")


def fetch_decision(meta: dict | None, html_fn, max_retries: int = MAX_RETRIES,
                   prior_attempts: int = 0) -> tuple[bool, str, int, str | None]:
    """One wave's fetch outcome for a page: (ok, failed_step,
    attempts_this_wave, html|None).

    Models the html_downloader retry loop (:172-217): each wave grants
    ``max_retries + 1`` attempts; HTTP-status failures consume attempts
    until the page's ``fail_attempts`` budget clears — cumulatively across
    waves via ``prior_attempts`` (the cross-wave re-enqueue path). Once a
    response body arrives, the content checks run in reference order:
    block-indicator scan (``is_blocked_html``), then the short-content
    floor; both exhaust the wave budget and are permanent.
    ``html_fn(meta) -> str`` renders the body lazily (only when the status
    budget clears)."""
    budget = max_retries + 1
    if meta is None:
        return False, "not_found", budget, None
    remaining = int(meta["fail_attempts"]) - prior_attempts
    if remaining >= budget:
        return False, f"status_{meta['status_code']}", budget, None
    html = html_fn(meta)
    if is_blocked_html(html):
        return False, "blocked", budget, None
    if len(html) < SHORT_CONTENT_FLOOR:
        return False, "short_content", budget, None
    return True, "", max(remaining, 0) + 1, html


def url_path(url: str) -> str:
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else "/"


@dataclass
class CrawlConfig:
    min_request_interval: float = MIN_REQUEST_INTERVAL
    max_retries: int = MAX_RETRIES
    max_enqueue_retries: int = MAX_ENQUEUE_RETRIES
    max_waves: int = 10
    num_shards: int = NUM_SHARDS
    seed: int = 42
    # politeness enforcement: "virtual" computes the deterministic per-host
    # schedule without sleeping (the conformance/bench mode — there is no
    # real network to be polite to); "wall" additionally gates each fetch to
    # its scheduled_at in real time × time_scale (live-crawl behavior)
    politeness_mode: str = "virtual"
    time_scale: float = 1.0
    # simulated network RTT: each fetch attempt sleeps
    # page latency_ms/1000 × this factor IN the fetch slot (synchronous-
    # client model — the slot is occupied while waiting, like a real
    # blocking HTTP fetch). 0 = no sleeping (pure-compute bench mode).
    # Outputs are identical either way; only wall-clock changes.
    fetch_latency_scale: float = 0.0


@dataclass
class OrderKey:
    """Total order of fetches: (wave, priority, host_shard, seq)."""
    wave: int
    priority: int
    host_shard: int
    seq: int

    def tuple(self) -> tuple[int, int, int, int]:
        return (self.wave, self.priority, self.host_shard, self.seq)


def canonical_host_shard(host: str) -> int:
    return host_shard(xxh64(host))
