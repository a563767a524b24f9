"""Hardware scaling-ceiling measurement for the bench box (BASELINE.md).

The crawl's heavy stage is fetch-simulate + parse + PNG encode/decode —
RNG- and memory-bandwidth-heavy. This artifact measures, WITHOUT Ray, how
that kernel and a pure-ALU busy loop scale from 8 to 32 processes on this
machine. Pipeline scaling efficiency is judged against the KERNEL ceiling:
no orchestration can scale the workload better than the bare kernel does.

Run (machine otherwise idle):  python tools/hw_ceiling.py
Prints one JSON line: throughputs at 8/32 procs + ceiling efficiencies.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _busy(n: int) -> int:
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + 12345) & 0x7FFFFFFF
    return acc


def busy_worker(n: int) -> int:
    return _busy(n)


def fetch_kernel_worker(args: tuple[int, int]) -> int:
    """The crawl's per-page work: derive page, render HTML, generate +
    encode + decode + phash every image — the real hot path of the wave."""
    seed, n = args
    from crawler_ray import geo
    from crawler_ray.imaging import decode_png, phash64
    from crawler_ray.sources.synthetic_web import (
        WebParams,
        _host_index,
        _prop_url,
        image_bytes,
        image_meta,
        page_meta,
        render_html,
    )

    p = WebParams(seed=42, n_hosts=30, props_per_host=1600, hot_hosts=3,
                  hot_factor=8, props_per_listing=150)
    hidx = _host_index(p)
    host = f"{geo.city_list(30)[seed % 30]}.craigslist.org"
    done = 0
    for j in range(n):
        url = _prop_url(p, host, seed % 30, j % 100)
        m = page_meta(url, p, hidx)
        if m is None:
            continue
        render_html(m)
        for iid, iu in zip(m["img_ids"], m["img_urls"]):
            im = image_meta(iu, p)
            phash64(decode_png(image_bytes(iid, im["w"], im["h"], im["fmt"], 42)))
        done += 1
    return done


def run_pool(worker, jobs, procs: int) -> float:
    t0 = time.time()
    with mp.Pool(procs) as pool:
        pool.map(worker, jobs)
    return time.time() - t0


def best_of(fn, repeats: int = 2) -> float:
    return min(fn() for _ in range(repeats))


def main():
    # N and 4N process levels; override with --levels LO,HI (the north
    # rule fixes the RATIO at 4×, not the absolute size)
    lo, hi = 8, 32
    if "--levels" in sys.argv:
        lo, hi = (int(x) for x in sys.argv[sys.argv.index("--levels") + 1].split(","))
    out: dict = {"metric": "hw_scaling_ceiling", "procs": [lo, hi]}
    factor = hi / lo

    total_iters = 240_000_000
    busy = {}
    for procs in (lo, hi):
        dt = best_of(lambda p=procs: run_pool(busy_worker,
                                              [total_iters // p] * p, p))
        busy[procs] = total_iters / dt
    out["busy_loop_ops_per_sec"] = {k: round(v) for k, v in busy.items()}
    out["busy_loop_ceiling"] = round((busy[hi] / busy[lo]) / factor, 3)

    total_pages = 6400
    kern = {}
    for procs in (lo, hi):
        dt = best_of(lambda p=procs: run_pool(
            fetch_kernel_worker, [(i, total_pages // p) for i in range(p)], p))
        kern[procs] = total_pages / dt
    out["fetch_kernel_pages_per_sec"] = {k: round(v, 1) for k, v in kern.items()}
    out["fetch_kernel_ceiling"] = round((kern[hi] / kern[lo]) / factor, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
