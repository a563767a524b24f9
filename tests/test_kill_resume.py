"""Kill -9 a crawl mid-run, resume, assert bit-identical final tables.

This is the north rule's 'a killed run resumes bit-identically' gate with a
real SIGKILL (not a simulated early stop): a subprocess crawls with its own
Ray instance, is killed mid-wave, and the resumed run must converge to the
same tables as an uninterrupted run (manifest-gated fragment visibility +
unreferenced-fragment sweep + deterministic fragment names).
"""

import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

from crawler_ray import semantics
from crawler_ray.sources.synthetic_web import WebParams, build_web

PARAMS = WebParams(seed=77, n_hosts=12, props_per_host=30, hot_hosts=1,
                   hot_factor=5, props_per_listing=10)

SCRIPT = textwrap.dedent(
    """
    import logging, ray, sys
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from crawler_ray.sources.synthetic_web import WebParams, build_web
    from crawler_ray.pipelines.crawl import run_crawl
    p = WebParams(seed=77, n_hosts=12, props_per_host=30, hot_hosts=1,
                  hot_factor=5, props_per_listing=10)
    run_crawl(build_web(p), p, sys.argv[1], fetch_concurrency=2)
    print("FINISHED", flush=True)
    """
)


@pytest.mark.timeout(300)
def test_sigkill_mid_crawl_then_resume(ray_session, tmp_path):
    from crawler_ray.pipelines.crawl import run_crawl

    web = build_web(PARAMS)
    killed_dir = str(tmp_path / "killed")
    full_dir = str(tmp_path / "full")

    env = dict(os.environ, PYTHONPATH=os.getcwd(), RAY_ADDRESS="")
    proc = subprocess.Popen([sys.executable, "-c", SCRIPT, killed_dir],
                            env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True, start_new_session=True)
    time.sleep(14)  # ray init ≈5-8s, then a few waves
    finished = proc.poll() is not None
    if not finished:
        os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()

    resumed = run_crawl(web, PARAMS, killed_dir, resume=True)
    full = run_crawl(web, PARAMS, full_dir)

    for table, keys in [
        ("seen", ["url", "url_hash"]),
        ("order", ["url", "wave", "priority", "host_shard", "seq"]),
        ("dlq", ["url", "failed_step", "retry_count"]),
        ("pages", ["url", "content_hash"]),
        ("store", ["image_id", "caption", "phash", "bytes"]),
    ]:
        a = sorted(tuple(r[k] for k in keys) for r in full.read(table).to_pylist())
        b = sorted(tuple(r[k] for k in keys) for r in resumed.read(table).to_pylist())
        assert a == b, f"{table} diverged after SIGKILL+resume (killed_early={not finished})"
