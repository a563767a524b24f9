"""The flagship crawl pipeline: Mercator-style frontier + fetch scheduler
as BFS waves of Ray Data pipelines (SURVEY.md §3 lifecycle diagram).

Per wave k (each arrow a streaming Dataset stage):

    candidates ─map_batches(PrepStage: normalize/relevance/robots/hash)─▶
               ─groupby(url_hash).map_groups(first-wins)  [dedup shuffle]─▶
               ─map_batches(SeenFilter: sharded seen-set anti-join)─▶
               ─priority (broadcast geo maps; listing alternation)─▶ frontier
    frontier   ─map_batches(SeenAdd)─▶ sort(order key) → order/seen fragments
               ─groupby(host).map_groups(politeness schedule)─▶
               ─map_batches(Fetcher actor pool)─▶ fetched (materialized once)
    fetched    ├─filter !ok─▶ DLQ fragments
               ├─filter property─▶ parse_fields ─▶ pages fragments
               │                        └─▶ ImageStage actor pool ─▶ store fragments
               └─parse_links─▶ next-wave candidate fragments
    manifest v{k}: cumulative fragment lists + listing_counter + metrics
      (the per-partition lineage triple: frontier offset ≙ next_frontier
       fragments, seen snapshot ≙ seen fragments, Lance fragment ids)

Scale notes: the only driver-side materialization is the wave's *listing*
candidates (O(hosts), needed for the reference's deterministic alternation
rule — SURVEY.md §7 hard-part 1); everything else streams. Dedup and store
partitioning shuffle on url_hash / host_shard.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from crawler_ray import geo, semantics
from crawler_ray.sources import lance_layout as ll
from crawler_ray.stages.crawl_stages import (
    Fetcher,
    ImageStage,
    PrepStage,
    SeenAdd,
    SeenFilter,
    dedup_first_wins,
    make_politeness_fn,
    property_mask,
)
from crawler_ray.stages import crawl_stages
from crawler_ray.state.seen import ShardedSeen

TABLES = ["order", "seen", "dlq", "pages", "store", "frontier"]


@dataclass
class CrawlRun:
    root: str
    waves: int
    counts: dict = field(default_factory=dict)

    def read(self, table: str) -> pa.Table:
        m = ll.latest_manifest(self.root)
        return ll.read_fragments(self.root, table, m["tables"].get(table, []))


def _candidates_ds(root: str, fragments: list[dict], table: pa.Table | None):
    if table is not None:
        return rd.from_arrow(table)
    paths = ll.fragment_paths(root, "frontier", fragments)
    return rd.read_parquet(paths) if paths else None


def run_crawl(
    web: dict,
    params,
    out_root: str,
    cfg: semantics.CrawlConfig | None = None,
    resume: bool = False,
    num_seen_shards: int = 4,
    fetch_concurrency: int = 3,
    image_concurrency: int = 3,
    fetch_batch_size: int = 128,
    image_batch_size: int = 64,
) -> CrawlRun:
    """Run (or resume) the crawl over a synthetic web; returns handles to the
    Lance-layout output at ``out_root``."""
    cfg = cfg or semantics.CrawlConfig(max_retries=params.max_retries)
    pages_by_url = {r["url"]: r for r in web["pages"].to_pylist()}
    robots_by_host = {r["host"]: r for r in web["robots"].to_pylist()}
    images_by_id = {r["image_id"]: r for r in web["images"].to_pylist()}
    city_state = geo.city_state_map(params.n_hosts)
    city_region = {c: geo.STATE_REGION[s] for c, s in city_state.items()}
    delay_by_host = {
        h: semantics.politeness_delay(robots_by_host.get(h), cfg.min_request_interval)
        for h in robots_by_host
    }

    web_ref = ray.put(pages_by_url)
    images_ref = ray.put(images_by_id)
    seen = ShardedSeen(num_seen_shards)

    cum: dict[str, list[dict]] = {t: [] for t in TABLES}
    listing_counter = 0
    start_wave = 0
    candidates_tbl: pa.Table | None = None
    next_frontier_frags: list[dict] = []

    if resume:
        m = ll.latest_manifest(out_root)
        if m is not None:
            ll.sweep_unreferenced(out_root, TABLES)
            cum = {t: m["tables"].get(t, []) for t in TABLES}
            listing_counter = m["listing_counter"]
            start_wave = m["wave"] + 1
            next_frontier_frags = m["next_frontier"]
            seen_tbl = ll.read_fragments(out_root, "seen", cum["seen"])
            if seen_tbl.num_rows:
                seen.restore(seen_tbl["url_hash"].to_numpy())
            if not next_frontier_frags:
                return CrawlRun(out_root, start_wave, m.get("counts", {}))
        else:
            resume = False
    if not resume:
        os.makedirs(out_root, exist_ok=True)
        candidates_tbl = pa.table(
            {
                "url": web["seeds"]["url"],
                "seq": web["seeds"]["seq"].cast(pa.int64()),
                "source": pa.array(["seed"] * web["seeds"].num_rows),
            }
        )

    prep = PrepStage(robots_by_host, city_region)
    seen_filter = SeenFilter(seen.shards, seen.num_shards)
    seen_add = SeenAdd(seen.shards, seen.num_shards)
    politeness = make_politeness_fn(delay_by_host)
    counts: dict = {}

    wave = start_wave
    while wave < cfg.max_waves:
        ds = _candidates_ds(out_root, next_frontier_frags, candidates_tbl)
        candidates_tbl = None
        if ds is None:
            break
        ds = ds.map_batches(prep, batch_format="pandas")
        ds = ds.groupby("url_hash").map_groups(dedup_first_wins, batch_format="pandas")
        ds = ds.map_batches(seen_filter, batch_format="pandas")
        pre = ds.materialize()

        # ---- priority (M7): listing alternation is sequential by definition
        # (reference RR counter) → computed on the driver over the wave's
        # listing candidates only (O(hosts) rows), broadcast back as a dict.
        listings = pre.map_batches(
            lambda b: b.loc[b["is_listing_page"], ["url", "seq", "known_city", "target"]],
            batch_format="pandas",
        ).to_pandas()
        listing_pri: dict[str, int] = {}
        if len(listings) == 0 or "seq" not in listings.columns:
            listings = pd.DataFrame(columns=["url", "seq", "known_city", "target"])
        listings = listings.sort_values(["seq", "url"], kind="mergesort")
        for row in listings.itertuples(index=False):
            if not row.target or not row.known_city:
                listing_pri[row.url] = -1
                continue
            listing_counter += 1
            listing_pri[row.url] = 1 if listing_counter % 2 == 0 else 2
        lp = dict(listing_pri)

        def assign_priority(b: pd.DataFrame, lp=lp) -> pd.DataFrame:
            pri = np.where(
                b["target"].to_numpy(bool) & b["known_city"].to_numpy(bool),
                b["region"].to_numpy() + 3,
                -1,
            ).astype(np.int8)
            isl = b["is_listing_page"].to_numpy(bool)
            if isl.any():
                pri[isl] = b.loc[isl, "url"].map(lp).fillna(-1).astype(np.int8)
            b = b.copy()
            b["priority"] = pri
            b = b.loc[pri >= 0, ["url", "url_hash", "host", "host_shard", "priority", "seq", "source"]]
            return b

        frontier = pre.map_batches(assign_priority, batch_format="pandas")
        frontier = frontier.map_batches(seen_add, batch_format="pandas")
        frontier = frontier.map_batches(
            lambda b, w=wave: b.assign(wave=np.int32(w)), batch_format="pandas"
        ).materialize()
        n_frontier = frontier.count()
        if n_frontier == 0:
            break

        seen_frags = ll.write_fragments(
            frontier.map_batches(lambda b: b[["url", "url_hash", "wave"]], batch_format="pandas"),
            out_root, "seen", f"w{wave}",
        )

        sched = frontier.groupby("host").map_groups(politeness, batch_format="pandas").materialize()
        ordered = sched.sort(["priority", "host_shard", "seq", "url"])
        order_frags = ll.write_fragments(
            ordered.map_batches(
                lambda b: b[["url", "wave", "priority", "host_shard", "seq", "host", "scheduled_at"]],
                batch_format="pandas",
            ),
            out_root, "order", f"w{wave}",
        )
        fetched = sched.map_batches(
            Fetcher,
            fn_constructor_kwargs=dict(web_ref=web_ref, max_retries=cfg.max_retries),
            batch_format="pandas",
            batch_size=fetch_batch_size,
            concurrency=fetch_concurrency,
        ).materialize()

        dlq_frags = ll.write_fragments(
            fetched.map_batches(
                lambda b: b.loc[~b["ok"], ["url", "url_hash", "host", "failed_step", "retry_count", "wave"]],
                batch_format="pandas",
            ),
            out_root, "dlq", f"w{wave}",
        )

        parsed = fetched.map_batches(
            lambda b: b.loc[b["ok"] & property_mask(b["url"])], batch_format="pandas"
        ).map_batches(crawl_stages.parse_fields, batch_format="pandas").materialize()

        pages_frags = ll.write_fragments(
            parsed.map_batches(lambda b: b.drop(columns=["img_urls"]), batch_format="pandas"),
            out_root, "pages", f"w{wave}",
        )
        store_frags = ll.write_fragments(
            parsed.map_batches(
                ImageStage,
                fn_constructor_kwargs=dict(images_ref=images_ref, seed=cfg.seed),
                batch_format="pandas",
                batch_size=image_batch_size,
                concurrency=image_concurrency,
            ),
            out_root, "store", f"w{wave}",
        )

        frontier_frags = ll.write_fragments(
            fetched.map_batches(crawl_stages.parse_links, batch_format="pandas"),
            out_root, "frontier", f"w{wave + 1}",
        )

        for t, frags in [("order", order_frags), ("seen", seen_frags), ("dlq", dlq_frags),
                         ("pages", pages_frags), ("store", store_frags), ("frontier", frontier_frags)]:
            cum[t].extend(frags)
        counts = {
            "wave": wave,
            "frontier": n_frontier,
            "dlq": sum(f["rows"] for f in dlq_frags),
            "pages": sum(f["rows"] for f in pages_frags),
            "store": sum(f["rows"] for f in store_frags),
            "seen_total": seen.total(),
        }
        ll.write_manifest(
            out_root, wave,
            dict(wave=wave, listing_counter=listing_counter, tables=cum,
                 next_frontier=frontier_frags, counts=counts),
        )
        next_frontier_frags = frontier_frags
        wave += 1
        if not frontier_frags:
            break

    return CrawlRun(out_root, wave, counts)
