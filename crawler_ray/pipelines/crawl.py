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
    Fetcher,
    FetchProcess,
    PrepStage,
    SeenAdd,
    SeenFilter,
    dedup_block,
    make_politeness_block,
)
from crawler_ray.state.seen import ShardedSeen

TABLES = ["order", "seen", "dlq", "pages", "store", "frontier"]

# frontier size above which the per-wave listing-candidate substring scan
# runs as a distributed map_batches filter instead of a driver-side
# pyarrow scan (the driver only ever receives the O(hosts) candidates)
LISTING_SCAN_DISTRIBUTED_ROWS = 100_000


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
        n_rows = sum(f["rows"] for f in frags)
        if n_rows > LISTING_SCAN_DISTRIBUTED_ROWS:
            # large wave: distribute the substring scan (the driver only
            # receives the O(hosts) listing candidates)
            cand = (rd.read_parquet(paths, columns=["url", "seq"])
                    .map_batches(lambda b: b.loc[b["url"].str.contains(
                        "/search/apa", case=False, regex=False)],
                        batch_format="pandas")
                    .to_pandas())
        else:
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


def pack_frontier_buckets(frags: list[dict], out_root: str,
                          fetch_concurrency: int) -> list[tuple[list[str], int]]:
    """Read-time LPT bin-packing of the host-sharded frontier buckets into
    block groups. Bucket row counts are known from the manifest, so
    buckets (complete hosts — a host is atomic under per-host politeness)
    pack greedily largest-first into k = min(2×fetch_concurrency, buckets)
    groups: makespan ≤ max(hottest bucket, ~total/k) — the hottest bucket
    is the irreducible atomic floor, and every other group stays near the
    mean. Returns (paths, rows) per group."""
    by_bucket: dict[str, list[tuple[str, int]]] = {}
    for f in frags:
        bucket = f["fragment"].split("-")[1]
        by_bucket.setdefault(bucket, []).append(
            (os.path.join(out_root, "frontier", f["fragment"]), int(f["rows"])))
    bucket_rows = {b: sum(r for _, r in fl) for b, fl in by_bucket.items()}
    # one group per bucket at most (buckets are atomic), as many groups as
    # the pool can use — NEVER throttle k for balance aesthetics: LPT
    # already minimizes makespan, and fewer groups only serializes the
    # non-hot rest (measured: a total/max_bucket cap cost 2× at 32 cpus)
    k = max(1, min(2 * fetch_concurrency, len(by_bucket)))
    loads = [0] * k
    group_paths: list[list[str]] = [[] for _ in range(k)]
    for b in sorted(by_bucket, key=lambda x: (-bucket_rows[x], x)):
        i = loads.index(min(loads))
        loads[i] += bucket_rows[b]
        group_paths[i].extend(p for p, _ in sorted(by_bucket[b]))
    return [(paths, load) for paths, load in zip(group_paths, loads) if paths]


def _run_wave_local(root: str, frags: list[dict], seeds_tbl: pa.Table | None,
                    prep, wave_tail, fp, fetch_batch_size: int) -> list[dict]:
    """Driver-local execution of a TINY wave with the identical kernels the
    distributed path uses (prep → per-host wave_tail → FetchProcess) — no
    executor launch, no exchange. Output fragments and side effects are the
    same tables the distributed path writes."""
    import pyarrow.parquet as pq

    if seeds_tbl is not None:
        cand = seeds_tbl.to_pandas()
    else:
        paths = ll.fragment_paths(root, "frontier", frags)
        cand = pd.concat([pq.read_table(p).to_pandas() for p in paths],
                         ignore_index=True)
    prepped = prep(cand)
    if isinstance(prepped, pa.Table):
        prepped = prepped.to_pandas()
    meta: list[dict] = []
    if len(prepped) == 0:
        return meta
    pieces = [wave_tail(g) for _, g in prepped.groupby("host", sort=True)]
    tail = pd.concat(pieces, ignore_index=True) if pieces else prepped.iloc[0:0]
    for i in range(0, len(tail), fetch_batch_size):
        t = fp(tail.iloc[i:i + fetch_batch_size])
        meta.extend(t.to_pylist())
    return meta


def run_crawl(
    web: dict,
    params,
    out_root: str,
    cfg: semantics.CrawlConfig | None = None,
    resume: bool = False,
    num_seen_shards: int = 4,
    fetch_concurrency: int = 3,
    fetch_batch_size: int = 256,
    num_partitions: int | None = None,
) -> CrawlRun:
    """Run (or resume) the crawl over a synthetic web; returns handles to the
    Lance-layout output at ``out_root``.

    The wave's keyed exchange is a sort-based ``groupby('host').map_groups``
    (NOT a HASH_SHUFFLE keyed repartition: its per-execution aggregator-actor
    spawn measured ~14 s PER WAVE at 32 cpus — the dominant scaling killer)."""
    return _run_crawl_inner(
        web, params, out_root, cfg, resume, num_seen_shards,
        fetch_concurrency, fetch_batch_size, num_partitions,
    )


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
    from crawler_ray.sizing import exchange_width

    num_partitions = num_partitions or exchange_width()
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
    # frontiers at or below this run driver-local (identical kernels, zero
    # executor launches): tail waves are a handful of URLs, and per-wave
    # executor+exchange fixed costs would exceed their compute by 10×. The
    # same reasoning holds on a real cluster — a 50-row wave is not
    # cluster-sized work.
    # waves below this run driver-local with the identical kernels: the
    # profiled fixed cost of a distributed execution (executor launch +
    # block round-trips) is ~2-5 s while a 1.5k-row wave folds locally in
    # <1 s — the crossover sits well above 600 (round-3 wave profile)
    local_threshold = int(os.environ.get("GRAFT_LOCAL_WAVE_ROWS", "1500"))
    # one quantum knob for BOTH the local-vs-distributed crossover and the
    # latency-mode fetch-block sizing below — setting GRAFT_SLEEP_QUANTUM
    # must keep the two policies consistent
    sleep_quantum = float(os.environ.get("GRAFT_SLEEP_QUANTUM", "3.0"))
    fetch_threads = max(1, Fetcher.THREADS)
    if cfg.fetch_latency_scale > 0:
        # simulated-RTT mode: a driver-local wave runs in ONE Fetcher whose
        # thread pool overlaps row sleeps ×THREADS, so the local crossover
        # sits where the overlapped sleep time matches the distributed
        # fixed cost (~3 s) — mean page latency is ~0.21 s before scaling
        # (synthetic_web.page_meta). The distributed path's executor launch
        # + exchange is a constant paid at EVERY parallelism level
        # (measured 8→32 scaling cost ~2 points), so small waves stay local
        local_threshold = min(local_threshold,
                              max(2, int(fetch_threads * sleep_quantum
                                         / (0.21 * cfg.fetch_latency_scale))))
    wave = start_wave
    while wave < cfg.max_waves:
        _t0 = _time.time()
        est_rows = sum(f["rows"] for f in next_frontier_frags) if next_frontier_frags else (
            candidates_tbl.num_rows if candidates_tbl is not None else 0
        )
        if candidates_tbl is None and not next_frontier_frags:
            break
        seed_candidates_tbl = candidates_tbl
        candidates_tbl = None
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

        # ---- fused wave tail per host group: dedup → seen anti-join →
        # priority → seen-add → politeness → write seen/order logs
        # (passthrough side effect). ONE sort-based groupby('host') serves
        # both wide steps of the wave: duplicates of a URL always share its
        # host, so host grouping co-locates every url_hash (exact first-wins
        # dedup per group) AND gives politeness its per-host ranks — and it
        # avoids HASH_SHUFFLE keyed repartition, whose per-execution
        # aggregator-actor spawn dominated wave wall-clock at 32 cpus.
        _t2 = _time.time()
        gate = (_time.time(), cfg.time_scale) if cfg.politeness_mode == "wall" else None
        fp = FetchProcess(params=params, out_root=out_root,
                          wave=wave, seed=cfg.seed, max_retries=cfg.max_retries,
                          gate=gate, max_enqueue_retries=cfg.max_enqueue_retries,
                          latency_scale=cfg.fetch_latency_scale,
                          # fragment-file count per wave = fetch tasks ×
                          # buckets, so bucket count stays at 16 until the
                          # pool is big enough that read parallelism needs
                          # more (measured: 2× buckets at 32 cpus doubled
                          # tiny files and cost more than the parallelism
                          # it bought; LPT packing balances at read time)
                          frontier_buckets=min(semantics.NUM_SHARDS,
                                               max(16, fetch_concurrency // 2)))
        writer = _SeenOrderWriter(out_root, wave)

        def wave_tail(g: pd.DataFrame, w=wave, ap=assign_priority) -> pd.DataFrame:
            g = dedup_block(g)
            g = seen_filter(g)
            g = ap(g)
            g = seen_add(g)
            g = g.assign(wave=np.int32(w))
            g = politeness(g)
            return writer(g)

        if est_rows <= local_threshold:
            meta = _run_wave_local(out_root, next_frontier_frags, seed_candidates_tbl,
                                   prep, wave_tail, fp, fetch_batch_size)
        else:
            def bucket_block(b: pd.DataFrame, wt=wave_tail) -> pd.DataFrame:
                p = prep(b)
                if isinstance(p, pa.Table):
                    p = p.to_pandas()
                if len(p) == 0:
                    return wt(p)
                return pd.concat([wt(g) for _, g in p.groupby("host", sort=True)],
                                 ignore_index=True)

            if seed_candidates_tbl is not None:
                # non-bucketed external candidates (a seed list can be
                # arbitrarily large): one sort-based host groupby, paid only
                # on wave 0
                ds = rd.from_arrow(seed_candidates_tbl).map_batches(
                    prep, batch_format="pandas")
                chain = ds.groupby("host").map_groups(wave_tail, batch_format="pandas")
            else:
                # bucketed frontier (host-sharded at write time): buckets are
                # LPT-bin-packed into balanced block groups (sizes known from
                # the manifest) and each group reads as ONE co-located block
                # → exact dedup + per-host politeness WITHOUT any shuffle.
                # The only exchange in the steady-state wave happened at
                # write time, file-granular and embarrassingly parallel.
                parts = [rd.read_parquet(paths, override_num_blocks=1)
                         for paths, _ in pack_frontier_buckets(
                             next_frontier_frags, out_root, fetch_concurrency)]
                ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
                chain = ds.map_batches(bucket_block, batch_format="pandas",
                                       batch_size=None)
            # break hot-host skew before the heavy stage: fetch is stateless
            # w.r.t. host (functional web), so an even row split suffices.
            # block size adapts so the pool has ≥2 tasks per fetch slot even
            # on small waves (fixed 512-row blocks left 32-cpu pools idle)
            lat = cfg.fetch_latency_scale > 0
            # simulated-RTT mode: fetch tasks SLEEP most of their wall, so
            # parallelism == in-flight task count. batch_size=fetch_rows
            # would let the map operator BUNDLE several sub-target blocks
            # into one task (measured: a 2.4k-row wave ran as 3 tasks ⇒
            # serial sleeps); one task per repartitioned block + a smaller
            # split target keeps the pool full. Compute-bound mode keeps
            # the tuned bundling (fewer, larger tasks amortize overhead).
            # est_rows counts PRE-dedup candidates (~2-5× the fetched rows),
            # so the latency-mode divisor/caps are deliberately aggressive:
            # measured at 32 cpus, a 13.7k-row wave split into only 15
            # blocks sleeps at half concurrency.
            if lat:
                # block granularity sets the wave-tail quantization waste:
                # a block's rows sleep in the Fetcher's thread pool, so its
                # wall is ~sum(row sleeps)/THREADS and the wave's wall is
                # rounded up to a whole block-sleep. Target ~3 s of
                # OVERLAPPED sleep per block (mean page latency ~0.21 s
                # before scaling): THREADS× more rows per block than the
                # serial client needed, so far fewer tasks for the same
                # quantum. min with a pool-fill cap so small waves still
                # split into ≥~16 blocks per slot (est_rows is pre-dedup,
                # ~2-5× the fetched rows, hence the aggressive divisor)
                q = sleep_quantum
                fetch_rows = int(np.clip(min(
                    fetch_threads * q / (0.21 * cfg.fetch_latency_scale),
                    est_rows / (16 * fetch_concurrency)),
                    2, 1024))
            else:
                fetch_rows = int(np.clip(-(-est_rows // (2 * fetch_concurrency)),
                                         64, fetch_batch_size * 2))
            if lat:
                # sleeping fetch tasks must own ~all slots: the default 50%
                # operator reservation on this ~20-op chain left ~5 of 32
                # slots idle (measured 26.7/32 concurrent). Scoped to this
                # dataset via its DataContext snapshot (same mechanism as
                # queries._keyed) — no global leak.
                chain.context.op_resource_reservation_ratio = 0.0
            meta_ds = chain.repartition(target_num_rows_per_block=fetch_rows).map_batches(
                fp, batch_format="pandas", batch_size=None if lat else fetch_rows
            )
            if debug and est_rows > int(os.environ.get("GRAFT_DEBUG_STATS_ROWS", "50000")):
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
