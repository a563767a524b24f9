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

Scale note: the old (url_hash → content_hash) map is broadcast via
``ray.put`` (one uint64 pair per crawled page). At 10^10 pages this becomes
a shuffle join on url_hash instead — the stage boundary is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from crawler_ray import semantics
from crawler_ray.sources import lance_layout as ll
from crawler_ray.stages.crawl_stages import Fetcher, ImageStage, property_mask
from crawler_ray.stages.parsers import dispatch_parse


class RecrawlProcess:
    """Fused refetch→parse→compare→store stage (actor-free task callable,
    same pattern as FetchProcess)."""

    def __init__(self, params, old_hashes_ref, out_root: str, wave: int,
                 seed: int, max_retries: int):
        self.fetcher = Fetcher(params, max_retries)
        self.images = ImageStage(params, seed)
        self.old_ref = old_hashes_ref
        self.writers = {
            "pages": ll.FragmentWriter(out_root, "pages", f"w{wave}"),
            "store": ll.FragmentWriter(out_root, "store", f"w{wave}", compression="none"),
            "dlq": ll.FragmentWriter(out_root, "dlq", f"w{wave}"),
        }
        self._old: dict | None = None

    def _write(self, table: str, data) -> list[dict]:
        if isinstance(data, pd.DataFrame):
            data = pa.Table.from_pandas(data, preserve_index=False)
        m = self.writers[table](data)
        return [{"table": table, "fragment": f, "rows": int(r)}
                for f, r in zip(m["fragment"].to_pylist(), m["rows"].to_pylist())]

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        if self._old is None:
            self._old = ray.get(self.old_ref)
        fetched = self.fetcher(batch)
        meta: list[dict] = []
        stats = {"checked": len(batch), "changed": 0, "unchanged": 0, "failed": 0}
        dlq = fetched.loc[~fetched["ok"],
                          ["url", "url_hash", "host", "failed_step", "retry_count", "wave"]]
        stats["failed"] = len(dlq)
        meta += self._write("dlq", dlq)
        prop = fetched.loc[fetched["ok"] & property_mask(fetched["url"])]
        if len(prop):
            parsed = dispatch_parse(prop)
            old = parsed["url_hash"].map(self._old)
            changed = parsed.loc[old.isna() | (old != parsed["content_hash"])]
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
    pages_tbl = ll.read_fragments(out_root, "pages", m["tables"]["pages"])
    old_hashes = dict(zip(pages_tbl["url_hash"].to_pylist(),
                          pages_tbl["content_hash"].to_pylist()))
    old_ref = ray.put(old_hashes)

    order_tbl = ll.read_fragments(out_root, "order", m["tables"]["order"])
    wave = int(m["wave"]) + 1
    frontier = order_tbl.select(["url", "host", "priority", "seq", "scheduled_at"])
    frontier = frontier.append_column("wave", pa.array([wave] * frontier.num_rows, pa.int32()))
    from crawler_ray.hashing import xxh64_array

    frontier = frontier.append_column("url_hash", pa.array(xxh64_array(frontier["url"])))
    shard = (xxh64_array(frontier["host"]) % np.uint64(semantics.NUM_SHARDS)).astype(np.int32)
    frontier = frontier.append_column("host_shard", pa.array(shard))

    rp = RecrawlProcess(params=params, old_hashes_ref=old_ref, out_root=out_root,
                        wave=wave, seed=cfg.seed, max_retries=cfg.max_retries)
    ds = rd.from_arrow(frontier).repartition(target_num_rows_per_block=fetch_batch_size * 2)
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
