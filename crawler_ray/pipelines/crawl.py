"""The flagship crawl pipeline: Mercator-style frontier + fetch scheduler
as BFS waves of Ray Data pipelines (SURVEY.md §3 lifecycle diagram).

Each wave k is ONE streaming execution (plus a tiny driver-side scan):

    [driver] listing candidates ← pushed-down substring scan of the wave's
             frontier fragments + the scalar rule chain → alternation dict
             (the reference's sequential RR counter, SURVEY.md §7 hard-part 1)

    candidates ─map_batches(PrepStage: normalize/relevance/robots/hash)─▶
               ─repartition(keys=['host'])   [THE wave shuffle: duplicates
                 of a URL share its host, so one exchange co-locates both
                 the dedup key and the politeness grouping]─▶
               ─map_batches(dedup_block: vectorized first-wins)─▶
               ─map_batches(SeenFilter: cuckoo-sharded seen anti-join)─▶
               ─map_batches(assign_priority + SeenAdd + politeness ledger)─▶
               ─map_batches(_SeenOrderWriter: seen/order fragments,
                 passthrough side effect, deterministic names)─▶
               ─repartition(even rows)   [breaks hot-host skew; the heavy
                 stage is host-stateless thanks to the functional web]─▶
               ─map_batches(FetchProcess: fetch→parse→image decode/store→
                 link extraction; dlq/pages/store/frontier fragments written
                 in-task]─▶ fragment metadata → driver
    manifest v{k}: cumulative fragment lists + listing_counter + metrics
      (the per-partition lineage triple: frontier offset ≙ next_frontier
       fragments, seen snapshot ≙ seen fragments, Lance fragment ids)
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
    FetchProcess,
    PrepStage,
    SeenAdd,
    SeenFilter,
    dedup_block,
    make_politeness_block,
)
from crawler_ray.state.seen import ShardedSeen

TABLES = ["order", "seen", "dlq", "pages", "store", "frontier"]


class _SeenOrderWriter:
    """Passthrough stage writing both per-wave conformance logs as a side
    effect (deterministic fragment names ⇒ retry-safe); the driver collects
    the fragment lists by prefix glob after the fused execution finishes."""

    def __init__(self, out_root: str, wave: int):
        self.seen_w = ll.FragmentWriter(out_root, "seen", f"w{wave}")
        self.order_w = ll.FragmentWriter(out_root, "order", f"w{wave}")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch):
            self.seen_w(pa.Table.from_pandas(batch[["url", "url_hash", "wave"]], preserve_index=False))
            self.order_w(pa.Table.from_pandas(
                batch[["url", "wave", "priority", "host_shard", "seq", "host", "scheduled_at"]],
                preserve_index=False))
        return batch


@dataclass
class CrawlRun:
    root: str
    waves: int
    counts: dict = field(default_factory=dict)

    def read(self, table: str) -> pa.Table:
        m = ll.latest_manifest(self.root)
        return ll.read_fragments(self.root, table, m["tables"].get(table, []))


def _listing_priorities(root, frags, seeds_tbl, robots_by_host, city_state, seen,
                        counter: int) -> tuple[dict, int]:
    """Driver-side listing-alternation priorities (M7's sequential RR rule).

    Listing candidates are O(hosts) per wave; a pushed-down substring scan
    over the frontier fragments + the SAME scalar rule chain the oracle
    uses (normalize/relevance/robots/dedup/seen) yields the wave's enqueued
    listing set in enqueue order, without materializing the prep output.
    """
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from crawler_ray.hashing import xxh64_array
    from crawler_ray.urlnorm import normalize_url, url_host

    if seeds_tbl is not None:
        df = seeds_tbl.to_pandas()
        df["url"] = [normalize_url(u) for u in df["url"]]
        df = df.dropna(subset=["url"])
        cand = df.loc[df["url"].str.contains("/search/apa", case=False, regex=False),
                      ["url", "seq"]]
    else:
        paths = ll.fragment_paths(root, "frontier", frags)
        if not paths:
            return {}, counter
        tbl = pads.dataset(paths).to_table(
            columns=["url", "seq"],
            filter=pc.match_substring(pc.utf8_lower(pc.field("url")), "/search/apa"),
        )
        cand = tbl.to_pandas()
        cand = cand.loc[[semantics.is_relevant_url(u) for u in cand["url"]]]
    if len(cand) == 0:
        return {}, counter
    cand = cand.loc[[
        semantics.robots_allowed(semantics.url_path(u), robots_by_host.get(url_host(u)))
        for u in cand["url"]
    ]]
    if len(cand) == 0:
        return {}, counter
    cand = cand.sort_values(["seq", "url"], kind="mergesort").drop_duplicates("url", keep="first")
    unseen = ~seen.contains(xxh64_array(cand["url"]))
    cand = cand.loc[unseen]
    lp: dict[str, int] = {}
    for u in cand["url"]:
        city = u.split("//")[1].split(".")[0] if "//" in u else ""
        if "craigslist.org" not in u.lower() or city not in city_state:
            lp[u] = -1
            continue
        counter += 1
        lp[u] = 1 if counter % 2 == 0 else 2
    return lp, counter


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
    fetch_batch_size: int = 256,
    num_partitions: int = 8,
) -> CrawlRun:
    """Run (or resume) the crawl over a synthetic web; returns handles to the
    Lance-layout output at ``out_root``."""
    from ray.data.context import DataContext, ShuffleStrategy

    # keyed repartition needs HASH_SHUFFLE; restore afterwards — leaking it
    # globally hangs unrelated groupby().map_groups pipelines (observed)
    ctx = DataContext.get_current()
    prev_strategy = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        return _run_crawl_inner(
            web, params, out_root, cfg, resume, num_seen_shards,
            fetch_concurrency, fetch_batch_size, num_partitions,
        )
    finally:
        ctx.shuffle_strategy = prev_strategy


def _run_crawl_inner(
    web: dict,
    params,
    out_root: str,
    cfg,
    resume: bool,
    num_seen_shards: int,
    fetch_concurrency: int,
    fetch_batch_size: int,
    num_partitions: int,
) -> CrawlRun:
    cfg = cfg or semantics.CrawlConfig(max_retries=params.max_retries)
    # robots flow through the real text path: render each host's rules to
    # robots.txt text and parse it back (T4 parity: 404/error ⇒ allow-all)
    from crawler_ray.functions.robots_txt import render_robots_txt, rules_for_host

    robots_by_host = {}
    for r in web["robots"].to_pylist():
        text = render_robots_txt(r) if r["fetch_status"] == 200 else None
        robots_by_host[r["host"]] = rules_for_host(r["host"], text, r["fetch_status"])
    city_state = geo.city_state_map(params.n_hosts)
    city_region = {c: geo.STATE_REGION[s] for c, s in city_state.items()}
    delay_by_host = {
        h: semantics.politeness_delay(robots_by_host.get(h), cfg.min_request_interval)
        for h in robots_by_host
    }

    # the simulated network is FUNCTIONAL (synthetic_web.page_meta derives a
    # page from (seed, url)), so fetch workers carry only `params` — no
    # web-sized broadcast exists anywhere
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
            seen_paths = ll.fragment_paths(out_root, "seen", cum["seen"])
            if seen_paths:
                # shard-side parallel restore — no driver-side full-table read
                seen.restore_from_fragments(seen_paths)
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
    politeness = make_politeness_block(delay_by_host, cfg.min_request_interval)
    counts: dict = {}

    import time as _time

    debug = bool(os.environ.get("GRAFT_CRAWL_DEBUG"))
    wave = start_wave
    while wave < cfg.max_waves:
        _t0 = _time.time()
        ds = _candidates_ds(out_root, next_frontier_frags, candidates_tbl)
        if ds is None:
            break
        # adaptive partitioning: tiny waves coalesce to one block (skip the
        # hash shuffle), big waves hash-partition for parallel exact dedup
        est_rows = sum(f["rows"] for f in next_frontier_frags) if next_frontier_frags else (
            candidates_tbl.num_rows if candidates_tbl is not None else 0
        )
        seed_candidates_tbl = candidates_tbl
        candidates_tbl = None
        parts = max(1, min(num_partitions, est_rows // 1500))
        # split the (size-bundled) read into enough blocks that the
        # vectorized prep parallelizes across the pool
        if est_rows > 32768:
            ds = ds.repartition(target_num_rows_per_block=16384)
        ds = ds.map_batches(prep, batch_format="pandas")
        # ONE host-keyed shuffle serves both wide steps of the wave:
        # duplicates of a URL always share its host, so host partitioning
        # co-locates every url_hash (exact first-wins dedup per block) AND
        # gives politeness its per-host grouping downstream — no second
        # exchange needed.
        if parts > 1:
            ds = ds.repartition(parts, keys=["host"])
        else:
            ds = ds.repartition(1)
        ds = ds.map_batches(dedup_block, batch_format="pandas")
        ds = ds.map_batches(seen_filter, batch_format="pandas")
        _t1 = _time.time()

        # ---- priority (M7): listing alternation is sequential by definition
        # (reference RR counter). Listing candidates are O(hosts), so the
        # driver re-derives them directly from the frontier fragments with a
        # pushed-down substring scan + the scalar rule chain — no
        # materialization of the full prep output is needed, keeping the
        # whole wave ONE streaming execution.
        lp, listing_counter = _listing_priorities(
            out_root, next_frontier_frags, seed_candidates_tbl, robots_by_host,
            city_state, seen, listing_counter,
        )

        def assign_priority(b: pd.DataFrame, lp=lp) -> pd.DataFrame:
            pri = np.where(
                b["target"].to_numpy(bool) & b["known_city"].to_numpy(bool),
                b["region"].to_numpy() + 3,
                -1,
            ).astype(np.int8)
            isl = b["is_listing_page"].to_numpy(bool)
            if isl.any():
                pri[isl] = b.loc[isl, "url"].map(lp).fillna(-1).astype(np.int8)
            # cross-wave retries keep their ORIGINAL priority (in particular
            # the listing RR counter must not advance again for them)
            isr = (b["source"] == "retry").to_numpy(bool)
            if isr.any():
                pri[isr] = b.loc[isr, "priority0"].to_numpy(np.int8)
            b = b.copy()
            b["priority"] = pri
            b = b.loc[pri >= 0, ["url", "url_hash", "host", "host_shard", "priority",
                                 "seq", "source", "prior_attempts", "n_enq"]]
            return b

        # priority assign + register in seen shards + politeness schedule
        # (host-partitioned so per-host ranks are computable per block)
        # ---- fused wave tail: priority → seen-add → politeness (host-keyed
        # partition) → write seen/order logs (passthrough side effect) →
        # even rebalance (breaks hot-host skew before the heavy stage) →
        # fetch/parse/store/links. ONE streaming execution; worker processes
        # persist across waves so broadcast host shards stay cached.
        _t2 = _time.time()
        gate = (_time.time(), cfg.time_scale) if cfg.politeness_mode == "wall" else None
        fp = FetchProcess(params=params, out_root=out_root,
                          wave=wave, seed=cfg.seed, max_retries=cfg.max_retries,
                          gate=gate, max_enqueue_retries=cfg.max_enqueue_retries)
        # blocks are already host-partitioned; row-wise stages preserve block
        # membership, so politeness needs no further exchange
        chain = ds.map_batches(assign_priority, batch_format="pandas").map_batches(
            seen_add, batch_format="pandas"
        ).map_batches(lambda b, w=wave: b.assign(wave=np.int32(w)), batch_format="pandas")
        chain = chain.map_batches(politeness, batch_format="pandas")
        chain = chain.map_batches(_SeenOrderWriter(out_root, wave), batch_format="pandas")
        # break hot-host skew before the heavy stage: fetch is stateless
        # w.r.t. host (functional web), so an even row split suffices.
        # blocks ≈ 2×batch keeps task count moderate (scheduling overhead)
        # while giving the pool enough tasks to balance
        fetch_rows = fetch_batch_size * 2
        meta_ds = chain.repartition(target_num_rows_per_block=fetch_rows).map_batches(
            fp, batch_format="pandas", batch_size=fetch_batch_size
        )
        if debug and est_rows > 50000:
            meta_ds = meta_ds.materialize()
            print(meta_ds.stats(), flush=True)
        meta = meta_ds.take_all()
        _t3 = _time.time()
        seen_frags = ll.glob_fragments(out_root, "seen", f"w{wave}")
        order_frags = ll.glob_fragments(out_root, "order", f"w{wave}")
        n_frontier = sum(f["rows"] for f in seen_frags)
        if n_frontier == 0:
            break

        frags_by_table: dict[str, list[dict]] = {"dlq": [], "pages": [], "store": [], "frontier": []}
        for m in meta:
            frags_by_table[m["table"]].append({"fragment": m["fragment"], "rows": int(m["rows"])})
        frontier_frags = frags_by_table["frontier"]

        for t in ["order", "seen"]:
            cum[t].extend({"order": order_frags, "seen": seen_frags}[t])
        for t in ["dlq", "pages", "store", "frontier"]:
            cum[t].extend(frags_by_table[t])
        counts = {
            "wave": wave,
            "frontier": n_frontier,
            "dlq": sum(f["rows"] for f in frags_by_table["dlq"]),
            "pages": sum(f["rows"] for f in frags_by_table["pages"]),
            "store": sum(f["rows"] for f in frags_by_table["store"]),
            "seen_total": seen.total(),
        }
        ll.write_manifest(
            out_root, wave,
            dict(wave=wave, listing_counter=listing_counter, tables=cum,
                 next_frontier=frontier_frags, counts=counts),
        )
        if debug:
            print(f"[wave {wave}] n={n_frontier} prep={_t1-_t0:.1f}s "
                  f"listings={_t2-_t1:.1f}s fused={_t3-_t2:.1f}s "
                  f"finalize={_time.time()-_t3:.1f}s", flush=True)
        next_frontier_frags = frontier_frags
        wave += 1
        if not frontier_frags:
            break

    return CrawlRun(out_root, wave, counts)
