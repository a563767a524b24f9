"""Incremental recrawl — the content-change dedup path (D2/M14).

The reference skips the whole store transaction when the refetched page's
content hash equals the cached one (worker.py:172-174,
cache_service.py:65-70). Batch-engine equivalent: re-fetch every previously
crawled URL (from the order log, which carries the politeness keys), parse,
and compare ``xxh64(html)`` against the previous pages table; only CHANGED
property pages produce new pages/store fragments. The delta is committed as
a new manifest version whose rows carry ``wave = prev_max + 1`` —
latest-wave-wins per url is the read-side merge rule
(``read_pages_latest``).

Scale path: the refetch frontier is the order log read distributed from its
fragments, and the old (url_hash → content_hash) pairs reach the fetch
batches via a left-outer shuffle join on url_hash (latest-wave-wins per
url_hash resolved in keyed blocks first) — nothing corpus-sized ever
touches the driver or a broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from crawler_ray import semantics
from crawler_ray.sizing import exchange_width as _W
from crawler_ray.sources import lance_layout as ll
from crawler_ray.stages.crawl_stages import Fetcher, ImageStage, property_mask
from crawler_ray.stages.parsers import dispatch_parse


class RecrawlProcess:
    """Fused refetch→parse→compare→store stage (actor-free task callable,
    same pattern as FetchProcess). The previous content hash arrives ON the
    batch rows (``old_content_hash``, delivered by the distributed
    left-outer join upstream) — no corpus-sized broadcast."""

    def __init__(self, params, out_root: str, wave: int,
                 seed: int, max_retries: int):
        self.fetcher = Fetcher(params, max_retries)
        self.images = ImageStage(params, seed)
        self.writers = {
            "pages": ll.FragmentWriter(out_root, "pages", f"w{wave}"),
            "store": ll.FragmentWriter(out_root, "store", f"w{wave}", compression="none"),
            "dlq": ll.FragmentWriter(out_root, "dlq", f"w{wave}"),
        }

    def _write(self, table: str, data) -> list[dict]:
        if isinstance(data, pd.DataFrame):
            data = pa.Table.from_pandas(data, preserve_index=False)
        m = self.writers[table](data)
        return [{"table": table, "fragment": f, "rows": int(r)}
                for f, r in zip(m["fragment"].to_pylist(), m["rows"].to_pylist())]

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        old_by_hash = dict(zip(batch["url_hash"], batch["old_content_hash"]))
        fetched = self.fetcher(batch.drop(columns=["old_content_hash"]))
        meta: list[dict] = []
        stats = {"checked": len(batch), "changed": 0, "unchanged": 0, "failed": 0}
        dlq = fetched.loc[~fetched["ok"],
                          ["url", "url_hash", "host", "failed_step", "retry_count", "wave"]]
        stats["failed"] = len(dlq)
        meta += self._write("dlq", dlq)
        prop = fetched.loc[fetched["ok"] & property_mask(fetched["url"])]
        if len(prop):
            parsed = dispatch_parse(prop)
            old = parsed["url_hash"].map(old_by_hash)
            # hashes travel as decimal strings through the join (a nullable
            # uint64 column would degrade to float64 and lose bits)
            changed = parsed.loc[old.isna() | (old != parsed["content_hash"].astype(str))]
            stats["changed"] = len(changed)
            stats["unchanged"] = len(parsed) - len(changed)
            if len(changed):
                meta += self._write("pages", changed.drop(columns=["img_urls"]))
                meta += self._write("store", self.images(changed))
        # listings: fetched for change detection only; never stored
        stats["unchanged"] += int((fetched["ok"] & ~property_mask(fetched["url"])).sum())
        import json
        meta.append({"table": "_stats", "fragment": json.dumps(stats), "rows": 0})
        out = pa.Table.from_pylist(meta) if meta else None
        return out if out is not None else pa.table(
            {"table": pa.array([], pa.string()), "fragment": pa.array([], pa.string()),
             "rows": pa.array([], pa.int64())})


def run_recrawl(web: dict, params, out_root: str,
                cfg: semantics.CrawlConfig | None = None,
                fetch_batch_size: int = 256) -> dict:
    """Re-fetch everything in the crawl at ``out_root``; commit only the
    changed delta as a new manifest version. Returns change stats."""
    cfg = cfg or semantics.CrawlConfig(max_retries=params.max_retries)
    m = ll.latest_manifest(out_root)
    if m is None:
        raise FileNotFoundError(f"no crawl manifest at {out_root}")
    wave = int(m["wave"]) + 1
    from crawler_ray.hashing import xxh64_array
    from crawler_ray.pipelines.queries import _keyed

    # frontier = the order log, read DISTRIBUTED from its fragments. A URL
    # can appear in several order rows (cross-wave retries), so dedup per
    # url_hash-keyed block before the join.
    order_paths = ll.fragment_paths(out_root, "order", m["tables"]["order"])

    def prep_front(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(url_hash=xxh64_array(b["url"]), wave=np.int32(wave))
        b["host_shard"] = (xxh64_array(b["host"]) % np.uint64(semantics.NUM_SHARDS)).astype(np.int32)
        return b

    frontier_ds = (_keyed(rd.read_parquet(
        order_paths, columns=["url", "host", "priority", "seq", "scheduled_at"]))
        .map_batches(prep_front, batch_format="pandas")
        .repartition(_W(), keys=["url_hash"])
        # deterministic survivor for URLs with several order rows (cross-wave
        # retries): latest (seq, scheduled_at) wins, matching latest_block's
        # keep="last" convention — hash-shuffled block order is not stable
        .map_batches(lambda b: b.sort_values(
            ["url_hash", "seq", "scheduled_at", "priority"], kind="mergesort")
            .drop_duplicates("url_hash", keep="last"), batch_format="pandas"))

    # previous content hashes: distributed latest-wave-wins per url_hash,
    # then a left-outer shuffle join onto the frontier — replaces the
    # driver-side dict broadcast (unbounded at 10^10 pages)
    pages_paths = ll.fragment_paths(out_root, "pages", m["tables"]["pages"])

    def latest_block(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["url_hash", "wave"], kind="mergesort").drop_duplicates(
            "url_hash", keep="last")
        return pd.DataFrame({
            "url_hash": b["url_hash"].to_numpy(np.uint64),
            "old_content_hash": b["content_hash"].to_numpy(np.uint64).astype(str),
        })

    prev_ds = (_keyed(rd.read_parquet(pages_paths, columns=["url_hash", "content_hash", "wave"]))
               .repartition(_W(), keys=["url_hash"])
               .map_batches(latest_block, batch_format="pandas"))

    joined = frontier_ds.join(prev_ds, join_type="left_outer",
                              num_partitions=_W(), on=("url_hash",))

    rp = RecrawlProcess(params=params, out_root=out_root,
                        wave=wave, seed=cfg.seed, max_retries=cfg.max_retries)
    ds = joined.repartition(target_num_rows_per_block=fetch_batch_size * 2)
    meta = ds.map_batches(rp, batch_format="pandas", batch_size=fetch_batch_size).take_all()

    stats = {"checked": 0, "changed": 0, "unchanged": 0, "failed": 0}
    frags_by_table: dict[str, list[dict]] = {"pages": [], "store": [], "dlq": []}
    for r in meta:
        if r["table"] == "_stats":
            import json
            s = json.loads(r["fragment"])
            for k in stats:
                stats[k] += s[k]
        else:
            frags_by_table[r["table"]].append({"fragment": r["fragment"], "rows": int(r["rows"])})

    tables = {t: list(f) for t, f in m["tables"].items()}
    for t in ("pages", "store", "dlq"):
        tables[t] = tables[t] + frags_by_table[t]
    ll.write_manifest(out_root, wave, dict(
        wave=wave, listing_counter=m["listing_counter"], tables=tables,
        next_frontier=[], counts={**m.get("counts", {}), "recrawl": stats}))
    return stats


def read_pages_latest(out_root: str) -> pd.DataFrame:
    """Read the pages table with latest-wave-wins per url (recrawl merge)."""
    m = ll.latest_manifest(out_root)
    df = ll.read_fragments(out_root, "pages", m["tables"]["pages"]).to_pandas()
    df = df.sort_values(["url", "wave"], kind="mergesort")
    return df.drop_duplicates("url", keep="last").reset_index(drop=True)
