"""Image-quality/assembly wave at bench-store scale.

Runs the three round-5b operators over the sf0.1 bench crawl store
(tens of thousands of stored images) with the SAME library functions the
driver contract uses (pipelines/multimodal.py), and verifies each result
EXACTLY against a single-process pandas/loop implementation:

1. caption_dedup_stats — one caption-keyed exchange, first-wins, per-host
   rollup; oracle = pandas groupby over the gathered metadata.
2. interleave_docs      — pages ⋈ store distributed hash join + per-page
   budgeted assembly; oracle = pandas merge + per-page loop.
3. sharpness_stats      — full actor-pool decode pass; the per-image
   variance-of-Laplacian is spot-checked on a deterministic sample
   against the per-pixel double-loop formulation, plus gate-rate stats.

Prints one JSON line per stage. Run (machine otherwise idle; see
BENCH/BASELINE.md noise discipline):
    python tools/multimodal_assembly_demo.py [store_root]
Builds the store with the bench crawl when the root has no manifest.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import ray  # noqa: E402

SEQ_BUDGET = 64
SHARP_MIN = 24_000_000_000
SPOT_N = 64


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/crawler_ray_bench_mm"
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    if not os.path.isdir(os.path.join(root, "_manifest")):
        import bench

        crawl = bench.run_crawl_bench(cpus, root)
        print(json.dumps({"stage": "build_store", **crawl}))

    from crawler_ray.sources import lance_layout as ll

    m = ll.latest_manifest(root)
    store_paths = ll.fragment_paths(root, "store", m["tables"]["store"])
    pages_paths = ll.fragment_paths(root, "pages", m["tables"]["pages"])

    meta = rd.read_parquet(
        store_paths, columns=["image_id", "src_url", "w", "h", "caption",
                              "host"]).to_pandas()
    n_rows = len(meta)

    # -- 1. caption dedup ----------------------------------------------------
    from crawler_ray.pipelines.multimodal import (
        caption_dedup_stats,
        interleave_docs,
        sharpness_stats,
    )

    t0 = time.time()
    got = caption_dedup_stats(rd.read_parquet(
        store_paths, columns=["image_id", "caption", "host"]))
    t1 = time.time()
    first = meta.sort_values("image_id").groupby("caption")["image_id"].first()
    keep = set(first)
    want = (meta.assign(k=meta["image_id"].isin(keep).astype(np.int64))
            .groupby("host", as_index=False)
            .agg(n_images=("image_id", "size"), n_kept=("k", "sum")))
    want["n_dropped"] = want["n_images"] - want["n_kept"]
    want = want.sort_values("host").reset_index(drop=True)
    cap_ok = got.astype({c: np.int64 for c in got.columns[1:]}).equals(
        want.astype({c: np.int64 for c in want.columns[1:]}))
    print(json.dumps({
        "stage": "caption_dedup", "rows": n_rows, "hosts": len(got),
        "n_kept": int(got["n_kept"].sum()),
        "n_dropped": int(got["n_dropped"].sum()),
        "sec": round(t1 - t0, 2),
        "rows_per_sec": round(n_rows / (t1 - t0)), "exact": bool(cap_ok)}))

    # -- 2. interleaved assembly ----------------------------------------------
    t0 = time.time()
    got_i = interleave_docs(
        rd.read_parquet(store_paths,
                        columns=["image_id", "src_url", "w", "h", "caption"]),
        rd.read_parquet(pages_paths, columns=["url", "title"]),
        SEQ_BUDGET).to_pandas()
    t1 = time.time()
    got_i = (got_i.astype({c: np.int64 for c in got_i.columns[1:]})
             .sort_values("url").reset_index(drop=True))
    titles = rd.read_parquet(pages_paths,
                             columns=["url", "title"]).to_pandas()
    title_of = dict(zip(titles["url"], titles["title"]))
    rows = []
    for url, g in meta.sort_values("image_id").groupby("src_url"):
        title_tok = len(title_of[url].split())
        total = title_tok
        kept = img_tok = 0
        for _, im in g.iterrows():
            cost = (math.ceil(int(im["w"]) / 14) * math.ceil(int(im["h"]) / 14)
                    + len(im["caption"].split()))
            if total + cost > SEQ_BUDGET:
                break
            total += cost
            img_tok += cost
            kept += 1
        rows.append(dict(url=url, n_images=len(g), n_kept=kept,
                         text_tokens=title_tok, image_tokens=img_tok,
                         total_tokens=total))
    want_i = (pd.DataFrame(rows).astype(
        {c: np.int64 for c in ("n_images", "n_kept", "text_tokens",
                               "image_tokens", "total_tokens")})
        .sort_values("url").reset_index(drop=True))
    int_ok = got_i.equals(want_i)
    print(json.dumps({
        "stage": "interleave_docs", "pages": len(got_i),
        "images": n_rows, "truncated_pages":
            int((got_i["n_kept"] < got_i["n_images"]).sum()),
        "sec": round(t1 - t0, 2),
        "pages_per_sec": round(len(got_i) / (t1 - t0)),
        "exact": bool(int_ok)}))

    # -- 3. sharpness decode pass ---------------------------------------------
    t0 = time.time()
    sharp = sharpness_stats(rd.read_parquet(store_paths),
                            SHARP_MIN, concurrency=max(2, cpus - 2),
                            batch_size=32).to_pandas()
    t1 = time.time()
    png_bytes = sum(os.path.getsize(p) for p in store_paths)
    # deterministic spot-check vs the per-pixel loop formulation
    from crawler_ray.hashing import xxh64_array
    from crawler_ray.imaging import decode_png

    sharp = sharp.sort_values("image_id").reset_index(drop=True)
    pick = sharp.iloc[(xxh64_array(sharp["image_id"].to_numpy(object))
                       % np.uint64(max(1, len(sharp) // SPOT_N)) == 0)]
    pick = pick.iloc[:SPOT_N]
    by_id = {}
    probe_ids = set(pick["image_id"])
    for p in store_paths:
        import pyarrow.parquet as pq

        t = pq.read_table(p, columns=["image_id", "bytes"])
        for r in t.to_pylist():
            if r["image_id"] in probe_ids:
                by_id[r["image_id"]] = r["bytes"]
    bad = 0
    for _, r in pick.iterrows():
        rgb = decode_png(by_id[r["image_id"]]).astype(int)
        h, w = rgb.shape[:2]
        s = s2 = n = 0
        for i in range(1, h - 1):
            for j in range(1, w - 1):
                def g(a, b):
                    return int(rgb[a, b, 0]) + int(rgb[a, b, 1]) + int(rgb[a, b, 2])
                L = (4 * g(i, j) - g(i - 1, j) - g(i + 1, j)
                     - g(i, j - 1) - g(i, j + 1))
                s += L
                s2 += L * L
                n += 1
        var = ((n * s2 - s * s) * 10**6) // (n * n) if n else 0
        if var != int(r["lap_var_ppm"]):
            bad += 1
    print(json.dumps({
        "stage": "sharpness", "images": len(sharp),
        "n_sharp": int(sharp["sharp"].sum()),
        "png_gb": round(png_bytes / 2**30, 2),
        "sec": round(t1 - t0, 2),
        "images_per_sec": round(len(sharp) / (t1 - t0)),
        "mb_per_sec": round(png_bytes / 2**20 / (t1 - t0), 1),
        "spot_checked": len(pick), "spot_mismatches": bad}))

    ray.shutdown()


if __name__ == "__main__":
    main()
