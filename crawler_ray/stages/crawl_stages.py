"""Batch-level stages of the crawl pipeline (all vectorized; SURVEY.md §2).

Stateless transforms are plain callables used as ``map_batches`` task
functions; the expensive/stateful stages (``Fetcher``, ``ImageStage``) are
callable CLASSES run as actor pools (client/broadcast setup in ``__init__``
once per actor, per-batch work in ``__call__``).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from crawler_ray import semantics
from crawler_ray.hashing import xxh64_array
from crawler_ray.sources.synthetic_web import image_bytes, image_meta, page_meta, render_html
from crawler_ray.imaging import decode_png, phash64
from crawler_ray.urlnorm import host_series, normalize_series, valid_fetch_mask, valid_link_mask


# ---------------------------------------------------------------------------
# Vectorized URL classification (reference property_matcher semantics)
# ---------------------------------------------------------------------------

def listing_mask(urls: pd.Series) -> np.ndarray:
    return urls.str.match(semantics.LISTING_RE.pattern, case=False, na=False).to_numpy(bool)


def property_mask(urls: pd.Series) -> np.ndarray:
    """Reference's substring-order check (property_matcher.py:43-54),
    vectorized: find('craigslist.org') < find('apa') < find('.html')
    (FIRST '.html' occurrence, matching the reference's find)."""
    low = urls.str.lower()
    i = low.str.find("craigslist.org")
    j = low.str.find("apa")
    ends = low.str.endswith(".html")
    k = low.str.find(".html")
    return ((i >= 0) & ends & (i < j) & (j < k)).fillna(False).to_numpy(bool)


def listing_page_mask(urls: pd.Series) -> np.ndarray:
    """Prioritizer's looser listing test (substring /search/apa)."""
    return urls.str.contains("/search/apa", case=False, regex=False, na=False).to_numpy(bool)


class PrepStage:
    """Candidate prep: (normalize seeds) → relevance → robots → hash/shard.

    ``robots_by_host`` and ``city_region`` are small broadcast dicts captured
    at construction (shipped once per task, J1/J6/T4 semantics).
    """

    def __init__(self, robots_by_host: dict, city_region: dict, normalize_seeds: bool = True):
        self.robots = robots_by_host
        self.city_region = city_region
        self.normalize_seeds = normalize_seeds

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return _empty_frontier()
        if "prior_attempts" not in batch.columns:
            batch = batch.assign(prior_attempts=np.int32(0), n_enq=np.int32(0),
                                 priority0=np.int8(-1))
        urls = batch["url"].astype("string")
        if self.normalize_seeds:
            is_seed = batch["source"] == "seed"
            if is_seed.any():
                urls = urls.mask(is_seed, normalize_series(urls[is_seed]))
        keep = urls.notna()
        # relevance: extracted links must be listing|property (worker.py:409);
        # retry rows were admitted in a previous wave — always pass
        extracted = (batch["source"] == "extracted").to_numpy(bool)
        relevant = listing_mask(urls) | property_mask(urls)
        keep &= ~extracted | relevant
        batch = batch.loc[keep.fillna(False)].copy()
        batch["url"] = urls[keep]
        if len(batch) == 0:
            return _empty_frontier()

        host = host_series(batch["url"])
        path = batch["url"].str.replace(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "", regex=True)
        path = path.str.split("?").str[0].replace("", "/")
        allowed = np.ones(len(batch), bool)
        for h in host.unique():
            rules = self.robots.get(h)
            if rules is None or rules["fetch_status"] != 200 or not rules["disallow_prefixes"]:
                continue
            m = (host == h).to_numpy(bool)
            bad = np.zeros(int(m.sum()), bool)
            for p in rules["disallow_prefixes"]:
                bad |= path[m].str.startswith(p).to_numpy(bool)
            allowed[m] = ~bad
        batch = batch.loc[allowed]
        if len(batch) == 0:
            return _empty_frontier()

        urls2 = batch["url"]
        host = host_series(urls2)
        out = pd.DataFrame(
            {
                "url": urls2.astype(str),
                "seq": batch["seq"].astype(np.int64),
                "source": batch["source"].astype(str),
                "host": host.astype(str),
                "prior_attempts": batch["prior_attempts"].astype(np.int32),
                "n_enq": batch["n_enq"].astype(np.int32),
                "priority0": batch["priority0"].astype(np.int8),
            }
        )
        out["url_hash"] = xxh64_array(out["url"])
        out["host_shard"] = (xxh64_array(out["host"]) % np.uint64(semantics.NUM_SHARDS)).astype(np.int32)
        city = out["url"].str.extract(r"^https?://([^.]+)\.", expand=False).fillna("")
        region = city.map(self.city_region)
        target = out["url"].str.lower().str.contains("craigslist.org", regex=False)
        out["region"] = region.fillna(-1).astype(np.int32)
        out["known_city"] = region.notna().to_numpy(bool)
        out["target"] = target.to_numpy(bool)
        out["is_listing_page"] = listing_page_mask(out["url"])
        # emit Arrow: the downstream keyed shuffle slices Arrow blocks
        # zero-copy; pandas blocks cost ~100× more to partition
        return pa.Table.from_pandas(out, preserve_index=False)


def _empty_frontier() -> pa.Table:
    return pa.Table.from_pandas(
        pd.DataFrame(
            {
                "url": pd.Series([], dtype=str), "seq": pd.Series([], dtype=np.int64),
                "source": pd.Series([], dtype=str), "host": pd.Series([], dtype=str),
                "prior_attempts": pd.Series([], dtype=np.int32),
                "n_enq": pd.Series([], dtype=np.int32),
                "priority0": pd.Series([], dtype=np.int8),
                "url_hash": pd.Series([], dtype=np.uint64),
                "host_shard": pd.Series([], dtype=np.int32),
                "region": pd.Series([], dtype=np.int32),
                "known_city": pd.Series([], dtype=bool), "target": pd.Series([], dtype=bool),
                "is_listing_page": pd.Series([], dtype=bool),
            }
        ),
        preserve_index=False,
    )


def dedup_block(batch: pd.DataFrame) -> pd.DataFrame:
    """Vectorized first-wins dedup for a hash-partitioned block: all rows of
    a url_hash are co-located (repartition(keys=['url_hash'])), so one
    sort + drop_duplicates per block replaces per-group Python. A retry row
    outranks extracted duplicates of the same URL (it carries the original
    order key and must survive the downstream seen anti-join)."""
    if len(batch) == 0:
        return batch
    b = batch.assign(_new=(batch["source"] != "retry").to_numpy(bool))
    b = b.sort_values(["url_hash", "_new", "seq", "url"], kind="mergesort").drop_duplicates(
        "url_hash", keep="first"
    )
    return b.drop(columns=["_new"])


def make_politeness_block(delay_by_host: dict, min_interval: float):
    """Vectorized politeness for a host-partitioned block: per-host rank in
    wave order × per-host delay (groupby-cumcount, no per-group Python).

    Skew note: hot hosts make host-keyed blocks uneven, but this stage is
    O(rows) cheap; the heavy fetch stage downstream is stateless w.r.t.
    host (the functional web needs no per-host broadcast), so the driver
    breaks skew with an even row rebalance before it.
    """

    def politeness_block(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            batch = batch.copy()
            batch["scheduled_at"] = pd.Series([], dtype=np.float64)
            return batch
        b = batch.sort_values(["host", "priority", "seq", "url"], kind="mergesort").copy()
        rank = b.groupby("host").cumcount().to_numpy(np.int64)
        delay = b["host"].map(delay_by_host).fillna(min_interval).to_numpy(np.float64)
        b["scheduled_at"] = rank.astype(np.float64) * delay
        return b

    return politeness_block


class SeenFilter:
    """Drop URLs already in the sharded seen set (cross-wave anti-join)."""

    def __init__(self, seen_shards: list, num_shards: int):
        self.shards = seen_shards
        self.num_shards = num_shards

    def _call_shards(self, method: str, hashes: np.ndarray):
        sid = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        parts = [np.nonzero(sid == s)[0] for s in range(self.num_shards)]
        refs, live = [], []
        for s, idx in enumerate(parts):
            if len(idx):
                refs.append(getattr(self.shards[s], method).remote(hashes[idx]))
                live.append(idx)
        return live, ray.get(refs)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return batch
        hashes = batch["url_hash"].to_numpy(np.uint64)
        mask = np.zeros(len(batch), bool)
        live, results = self._call_shards("contains", hashes)
        for idx, res in zip(live, results):
            mask[idx] = res
        # cross-wave retries are in the seen set by definition — keep them
        if "source" in batch.columns:
            mask &= (batch["source"] != "retry").to_numpy(bool)
        return batch.loc[~mask]


class SeenAdd(SeenFilter):
    """Register the wave's enqueued URLs in the seen shards (idempotent)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch):
            self._call_shards("add", batch["url_hash"].to_numpy(np.uint64))
        return batch


class Fetcher:
    """Fetch stage (T2 analogue). The 'network' is the FUNCTIONAL synthetic
    web: a page's metadata derives from (seed, url) on demand
    (synthetic_web.page_meta), so workers need only the tiny WebParams —
    nothing web-sized is broadcast, matching a real crawler whose state is
    the network itself. Applies the html_downloader retry policy
    (is_valid_url gate, blocked/short/status retries → DLQ)."""

    #: threads per fetch actor when a row can SLEEP (simulated RTT or a
    #: wall-clock politeness gate): sleeps release the GIL, so in-flight
    #: rows overlap like a real async client's connections, and a block's
    #: sleep wall drops from sum(row sleeps) to ~sum/threads. Compute-only
    #: mode stays serial (threads cannot overlap GIL-bound rendering).
    THREADS = int(os.environ.get("GRAFT_FETCH_THREADS", "16"))

    def __init__(self, params, max_retries: int = semantics.MAX_RETRIES,
                 gate: tuple | None = None, latency_scale: float = 0.0):
        from crawler_ray.sources.synthetic_web import _host_index

        self.params = params
        self.hidx = _host_index(params)
        self.max_retries = max_retries
        self.gate = gate  # (epoch_wall_time, time_scale) → live politeness
        # simulated network RTT (CrawlConfig.fetch_latency_scale): sleep
        # latency_ms × scale per attempt, in-slot (synchronous client)
        self.latency_scale = latency_scale
        self._pool = None  # per-actor, built on first sleeping batch

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.gate is not None and len(batch) and "scheduled_at" in batch.columns:
            import time as _t

            epoch, scale = self.gate
            batch = batch.sort_values("scheduled_at", kind="mergesort")
            targets = epoch + batch["scheduled_at"].to_numpy(np.float64) * scale
        else:
            targets = None
        import json

        from crawler_ray.sources.synthetic_web import response_headers

        n = len(batch)
        ok = np.zeros(n, bool)
        step = np.full(n, "", object)
        attempts_total = np.zeros(n, np.int32)
        html = np.full(n, "", object)
        headers = np.full(n, "", object)
        duration = np.zeros(n, np.float64)
        fetchable = valid_fetch_mask(batch["url"]) if n else np.zeros(0, bool)
        prior = (batch["prior_attempts"].to_numpy(np.int32)
                 if "prior_attempts" in batch.columns else np.zeros(n, np.int32))
        urls = batch["url"].tolist()

        def fetch_one(i: int) -> None:
            # rows write to DISJOINT indices of the preallocated arrays, so
            # the threaded path needs no locks; each row's politeness target
            # is an absolute wall instant, preserved regardless of which
            # thread runs it or when
            url = urls[i]
            if targets is not None:
                import time as _t

                wait = targets[i] - _t.time()
                if wait > 0:
                    _t.sleep(wait)
            if not fetchable[i]:
                step[i] = "invalid_url"
                return
            meta = page_meta(url, self.params, self.hidx)
            success, fstep, attempts, body = semantics.fetch_decision(
                meta, render_html, self.max_retries, int(prior[i]))
            if self.latency_scale > 0:
                import time as _t

                _t.sleep(meta["latency_ms"] / 1000.0 * self.latency_scale * attempts)
            attempts_total[i] = prior[i] + attempts
            if not success:
                step[i] = fstep
                return
            ok[i] = True
            html[i] = body
            headers[i] = json.dumps(response_headers(url, len(body)), sort_keys=True)
            duration[i] = meta["latency_ms"] / 1000.0

        sleeping = self.latency_scale > 0 or targets is not None
        if sleeping and n > 1 and self.THREADS > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(max_workers=self.THREADS)
            # submission order follows the politeness sort, so same-host
            # rows enter the pool schedule-first
            list(self._pool.map(fetch_one, range(n)))
        else:
            for i in range(n):
                fetch_one(i)
        out = batch.copy()
        out["ok"] = ok
        out["failed_step"] = step.astype(str)
        out["attempts_total"] = attempts_total
        out["retry_count"] = np.maximum(attempts_total - 1, 0)
        out["html"] = html.astype(str)
        out["headers"] = headers.astype(str)
        out["crawl_duration"] = duration
        return out


def parse_links(batch: pd.DataFrame) -> pd.DataFrame:
    """Link extraction (M2–M4): hrefs → normalize(base) → valid filter →
    per-page first-occurrence dedup → child candidates with intrinsic seq."""
    empty = pd.DataFrame({"url": pd.Series([], dtype=str),
                          "seq": pd.Series([], dtype=np.int64),
                          "source": pd.Series([], dtype=str),
                          "prior_attempts": pd.Series([], dtype=np.int32),
                          "n_enq": pd.Series([], dtype=np.int32),
                          "priority0": pd.Series([], dtype=np.int8),
                          "host_shard": pd.Series([], dtype=np.int32)})
    batch = batch.loc[batch["ok"]]
    if len(batch) == 0:
        return empty
    hrefs = batch["html"].str.findall(r'<a href="([^"]+)"')
    flat = hrefs.explode().dropna()
    if len(flat) == 0:
        return empty
    parent_pos = flat.groupby(level=0).cumcount()
    base = batch["url"].reindex(flat.index)
    parent_hash = batch["url_hash"].reindex(flat.index)
    norm = normalize_series(flat.reset_index(drop=True).astype("string"),
                            base.reset_index(drop=True).astype("string"))
    df = pd.DataFrame(
        {
            "url": norm,
            "page": flat.index.to_numpy(),
            "pos0": parent_pos.to_numpy(),
            "parent_hash": parent_hash.to_numpy(np.uint64),
        }
    )
    df = df.loc[df["url"].notna()]
    if len(df) == 0:
        return empty
    df = df.loc[valid_link_mask(df["url"])]
    if len(df) == 0:
        return empty
    df = df.sort_values(["page", "pos0"], kind="mergesort")
    df = df.drop_duplicates(subset=["page", "url"], keep="first")
    pos = df.groupby("page").cumcount().to_numpy(np.int64)
    ph = df["parent_hash"].to_numpy(np.uint64)
    seq = (((ph >> np.uint64(16)) & np.uint64((1 << 46) - 1)) << np.uint64(16)).astype(np.int64) | pos
    urls = df["url"].astype(str)
    shard = (xxh64_array(host_series(urls)) % np.uint64(semantics.NUM_SHARDS)).astype(np.int32)
    return pd.DataFrame({"url": urls.to_numpy(),
                         "seq": seq, "source": "extracted",
                         "prior_attempts": np.int32(0), "n_enq": np.int32(0),
                         "priority0": np.int8(-1), "host_shard": shard})


def parse_fields(batch: pd.DataFrame) -> pd.DataFrame:
    """Property-page parser (M8/M9): vectorized regex extraction of the
    fields the reference parser produces (craigslist_parser.py:52-191)."""
    cols = ["url", "url_hash", "host", "host_shard", "wave", "crawl_duration", "headers"]
    cols = [c for c in cols if c in batch.columns]
    h = batch["html"]
    out = batch[cols].copy()
    out["title"] = h.str.extract(r'<span id="titletextonly">([^<]*)</span>', expand=False)
    price = h.str.extract(r'<span class="price">\$([\d,]+)</span>', expand=False)
    out["price"] = price.str.replace(",", "", regex=False).astype("Int64")
    out["address"] = h.str.extract(r'<div class="mapaddress">([^<]*)</div>', expand=False)
    out["latitude"] = h.str.extract(r'data-latitude="([^"]+)"', expand=False).astype(float)
    out["longitude"] = h.str.extract(r'data-longitude="([^"]+)"', expand=False).astype(float)
    bubble = h.str.extract(r'<span class="shared-line-bubble">(.*?)</span>', expand=False)
    out["beds"] = bubble.str.extract(r"(\d+)\s*br", expand=False).astype("Int32")
    out["baths"] = bubble.str.extract(r"(\d+(?:\.\d+)?)\s*ba", expand=False).astype(float)
    out["sqft"] = bubble.str.extract(r"(\d+(?:,\d+)?)\s*ft[²2]", expand=False).str.replace(",", "", regex=False).astype("Int32")
    posted = h.str.extract(r'<time class="date" datetime="([^"]+)"', expand=False)
    out["posted_date"] = pd.to_datetime(posted, utc=True, format="ISO8601").dt.tz_localize(None)
    low = out["url"].str.lower()
    out["property_type"] = np.where(low.str.contains("apa", regex=False), "apartment",
                                    np.where(low.str.contains("rea", regex=False), "real estate", None))
    out["city"] = out["url"].str.extract(r"^https?://([^.]+)\.craigslist\.org", expand=False)
    out["caption"] = h.str.extract(r'<section id="postingbody">([^<]*)</section>', expand=False).fillna("")
    out["img_urls"] = h.str.findall(r'<img src="([^"]+)">')
    out["status_code"] = np.int16(200)
    out["content_hash"] = xxh64_array(h)
    return out


class FetchProcess:
    """Fused fetch→parse→store actor stage (the wave's heavy inner loop).

    One actor pool per wave holding the broadcast web + image dicts; each
    batch is fetched, parsed, its images decoded/verified, and the four
    output tables (dlq, pages, store, next-wave frontier) written as
    immutable fragments INSIDE the actor (atomic tmp+rename). Only tiny
    fragment-metadata rows flow back to the driver, so HTML and image bytes
    never transit the driver and the whole wave is one streaming execution.
    """

    # host-shard buckets per wave; the default is overridden per run with
    # min(NUM_SHARDS, max(16, 2 × fetch_concurrency)) so next-wave prep
    # parallelism scales with the pool (prep blocks = buckets). A host is
    # ATOMIC under per-host politeness (a sequential rate-limited queue
    # cannot be split without violating spacing — true of Mercator too, its
    # salting spreads HOSTS across queues, not one host across queues), so
    # the irreducible per-bucket floor is the hottest host's row count; the
    # hot-host balance test asserts bucketing adds no skew beyond it.
    FRONTIER_BUCKETS = 16

    def __init__(self, params, out_root: str, wave: int,
                 seed: int, max_retries: int, gate: tuple | None = None,
                 max_enqueue_retries: int = semantics.MAX_ENQUEUE_RETRIES,
                 frontier_buckets: int | None = None,
                 latency_scale: float = 0.0):
        from crawler_ray.sources.lance_layout import FragmentWriter

        if frontier_buckets is not None:
            self.FRONTIER_BUCKETS = int(frontier_buckets)
        self.fetcher = Fetcher(params, max_retries, gate=gate,
                               latency_scale=latency_scale)
        self.max_enqueue_retries = max_enqueue_retries
        self.images = ImageStage(params, seed)
        self.writers = {
            "dlq": FragmentWriter(out_root, "dlq", f"w{wave}"),
            "pages": FragmentWriter(out_root, "pages", f"w{wave}"),
            # store rows are dominated by already-compressed PNG bytes —
            # zstd over them wastes ~2.5 s CPU per GB for ~0% gain
            "store": FragmentWriter(out_root, "store", f"w{wave}", compression="none"),
        }
        # next-wave frontier fragments are BUCKETED BY HOST SHARD at write
        # time (Mercator-style host-sharded frontier): every row of a host
        # lands in exactly one bucket, so the next wave reads each bucket as
        # one co-located block and needs NO shuffle for dedup/politeness.
        self.frontier_writers = {
            b: FragmentWriter(out_root, "frontier", f"w{wave + 1}-b{b:03d}")
            for b in range(self.FRONTIER_BUCKETS)
        }
        # worker-crash failpoint (tests/test_worker_crash_retry.py): armed
        # via GRAFT_FETCH_FAULT_DIR in the DRIVER env at construction (the
        # instance pickles into every task), fires at most once — O_EXCL on
        # the flag file — and only inside a remote worker, never on the
        # driver-local wave path
        self._fault_dir = os.environ.get("GRAFT_FETCH_FAULT_DIR")
        self._driver_pid = os.getpid()

    def _maybe_fault(self) -> None:
        """Kill this worker AFTER the task's fragment writes but BEFORE its
        metadata returns — the hardest retry point: Ray must re-execute the
        task, whose rewrite lands on the SAME content-digest fragment files,
        so the crawl converges bit-identically to a no-fault run."""
        if not self._fault_dir or os.getpid() == self._driver_pid:
            return
        try:
            fd = os.open(os.path.join(self._fault_dir, "died"),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return
        os.close(fd)
        os._exit(1)

    def _write(self, table: str, data) -> list[dict]:
        if isinstance(data, pd.DataFrame):
            data = pa.Table.from_pandas(data, preserve_index=False)
        meta = self.writers[table](data)
        return [
            {"table": table, "fragment": f, "rows": r}
            for f, r in zip(meta["fragment"].to_pylist(), meta["rows"].to_pylist())
        ]

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        fetched = self.fetcher(batch)
        meta: list[dict] = []
        dlq = fetched.loc[~fetched["ok"],
                          ["url", "url_hash", "host", "failed_step", "retry_count", "wave"]]
        meta += self._write("dlq", dlq)
        prop = fetched.loc[fetched["ok"] & property_mask(fetched["url"])]
        if len(prop):
            from crawler_ray.stages.parsers import dispatch_parse

            parsed = dispatch_parse(prop)
            meta += self._write("pages", parsed.drop(columns=["img_urls"]))
            meta += self._write("store", self.images(parsed))
        links = parse_links(fetched)
        # cross-wave DLQ re-enqueue (SURVEY §4): transient (HTTP-status)
        # failures below the re-enqueue cap go back into the next wave's
        # frontier carrying their cumulative attempt count and original
        # priority/order key — fixing the reference's silent URL loss
        # (worker.py:370-372,493-496)
        failed = fetched.loc[~fetched["ok"]]
        if len(failed):
            retryable = (failed["failed_step"].map(semantics.retryable_step).to_numpy(bool)
                         & (failed["n_enq"].to_numpy(np.int32) < self.max_enqueue_retries))
            r = failed.loc[retryable]
            if len(r):
                links = pd.concat([links, pd.DataFrame({
                    "url": r["url"].astype(str).to_numpy(),
                    "seq": r["seq"].astype(np.int64).to_numpy(),
                    "source": "retry",
                    "prior_attempts": r["attempts_total"].astype(np.int32).to_numpy(),
                    "n_enq": (r["n_enq"].to_numpy(np.int32) + 1),
                    "priority0": r["priority"].astype(np.int8).to_numpy(),
                    "host_shard": r["host_shard"].astype(np.int32).to_numpy(),
                })], ignore_index=True)
        if len(links):
            buckets = links["host_shard"].to_numpy(np.int32) % self.FRONTIER_BUCKETS
            for b in np.unique(buckets):
                part = pa.Table.from_pandas(links.loc[buckets == b], preserve_index=False)
                w = self.frontier_writers[int(b)](part)
                meta += [{"table": "frontier", "fragment": f, "rows": int(rr)}
                         for f, rr in zip(w["fragment"].to_pylist(), w["rows"].to_pylist())]
        self._maybe_fault()
        if not meta:
            return pa.table({"table": pa.array([], pa.string()),
                             "fragment": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        return pa.Table.from_pylist(meta)


class ImageStage:
    """Image download+decode+verify actor pool (S9/M10 analogue): explode a
    page's image URLs → deterministic bytes → decode → (w, h, fmt, phash)
    store rows. Image metadata is broadcast per host (same lazy-shard
    pattern as Fetcher). Heavy binary output ⇒ callers use a small
    batch_size."""

    def __init__(self, params, seed: int = 42):
        self.params = params
        self.seed = seed

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        ids, blobs, ws, hs, fmts, captions, phashes, hosts, shards, waves, srcs = \
            [], [], [], [], [], [], [], [], [], [], []
        for row in batch.itertuples(index=False):
            for img_url in row.img_urls:
                im = image_meta(img_url, self.params)
                iid = im["image_id"]
                data = image_bytes(iid, im["w"], im["h"], im["fmt"], self.seed)
                ids.append(iid)
                blobs.append(data)
                ws.append(im["w"]); hs.append(im["h"]); fmts.append(im["fmt"])
                captions.append(row.caption)
                phashes.append(phash64(decode_png(data)))
                hosts.append(row.host); shards.append(row.host_shard)
                waves.append(row.wave); srcs.append(row.url)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array(ws, pa.int32()), "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
                "caption": pa.array(captions, pa.string()),
                "phash": pa.array(phashes, pa.int64()),
                "host": pa.array(hosts, pa.string()),
                "host_shard": pa.array(shards, pa.int32()),
                "wave": pa.array(waves, pa.int32()),
                "src_url": pa.array(srcs, pa.string()),
            }
        )
