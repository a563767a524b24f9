"""Wall-clock politeness mode: fetches are really gated to their schedule."""

import time

import numpy as np
import pandas as pd
import pytest

from crawler_ray import semantics
from crawler_ray.sources.synthetic_web import WebParams, build_web
from crawler_ray.stages.crawl_stages import Fetcher


def test_fetcher_gate_sleeps_to_schedule():
    p = WebParams(seed=9, n_hosts=3, props_per_host=4, hot_hosts=0, props_per_listing=4)
    web = build_web(p)
    urls = web["seeds"]["url"].to_pylist()
    epoch = time.time()
    interval = 0.08
    batch = pd.DataFrame({
        "url": urls,
        "host": [u.split("/")[2] for u in urls],
        "scheduled_at": np.arange(len(urls), dtype=np.float64) * interval,
    })
    f = Fetcher(p, gate=(epoch, 1.0))
    t0 = time.time()
    out = f(batch)
    elapsed = time.time() - t0
    # last fetch must not start before its target: (n-1) × interval
    assert elapsed >= (len(urls) - 1) * interval - 0.01
    assert out["ok"].all()


def test_latency_mode_output_identical(ray_session, tmp_path):
    """Simulated-RTT mode (fetch_latency_scale) only sleeps — every output
    table must be row-identical to the no-latency crawl."""
    from crawler_ray.pipelines.crawl import run_crawl

    p = WebParams(seed=9, n_hosts=3, props_per_host=4, hot_hosts=0,
                  props_per_listing=4)
    runs = {}
    for name, scale in (("base", 0.0), ("lat", 0.02)):
        cfg = semantics.CrawlConfig(max_retries=p.max_retries, max_waves=4,
                                    fetch_latency_scale=scale)
        runs[name] = run_crawl(build_web(p), p, str(tmp_path / name), cfg=cfg)
    for table in ("order", "pages", "dlq"):
        a = runs["base"].read(table).to_pandas()
        b = runs["lat"].read(table).to_pandas()
        cols = sorted(a.columns)
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols).reset_index(drop=True),
            b[cols].sort_values(cols).reset_index(drop=True))


def test_wall_mode_crawl_respects_schedule(ray_session, tmp_path):
    from crawler_ray.pipelines.crawl import run_crawl
    from crawler_ray.sources import lance_layout as ll

    p = WebParams(seed=9, n_hosts=2, props_per_host=3, hot_hosts=0, props_per_listing=3)
    cfg = semantics.CrawlConfig(max_retries=p.max_retries, max_waves=2,
                                min_request_interval=0.2,
                                politeness_mode="wall", time_scale=1.0)
    t0 = time.time()
    run = run_crawl(build_web(p), p, str(tmp_path / "wall"), cfg=cfg)
    elapsed = time.time() - t0
    order = run.read("order").to_pylist()
    max_sched = max(r["scheduled_at"] for r in order)
    assert max_sched > 0  # some host fetched more than once per wave
    assert elapsed >= max_sched  # the crawl really waited for the schedule
