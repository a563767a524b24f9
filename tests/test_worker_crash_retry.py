"""Worker-crash conformance: kill a fetch worker mid-wave (os._exit inside a
running task, AFTER its fragment writes, BEFORE its metadata returns) and
assert the crawl converges bit-identically to a no-fault run.

This is the cluster-scale failure the SIGKILL-resume test doesn't cover: a
single worker dying on a healthy cluster. Ray retries the task; the retry's
fragment writes land on the SAME content-digest file names (idempotent side
effects), so the manifest references exactly one copy of everything."""

from __future__ import annotations

import os

import pandas as pd

from crawler_ray.pipelines.crawl import run_crawl
from crawler_ray.sources.synthetic_web import WebParams, build_web

PARAMS = WebParams(seed=11, n_hosts=8, props_per_host=12, hot_hosts=1,
                   hot_factor=3)
TABLES = ("seen", "order", "pages", "dlq", "store")


def _norm(t) -> pd.DataFrame:
    df = t.to_pandas()
    return (df[sorted(df.columns)]
            .sort_values(sorted(df.columns), kind="mergesort")
            .reset_index(drop=True))


def test_worker_crash_converges_bit_identically(ray_session, tmp_path,
                                                monkeypatch):
    # force the distributed wave path — the failpoint only fires in workers
    monkeypatch.setenv("GRAFT_LOCAL_WAVE_ROWS", "0")

    base = run_crawl(build_web(PARAMS), PARAMS, str(tmp_path / "base"),
                     fetch_concurrency=2)

    fault_dir = tmp_path / "fault"
    fault_dir.mkdir()
    monkeypatch.setenv("GRAFT_FETCH_FAULT_DIR", str(fault_dir))
    faulted = run_crawl(build_web(PARAMS), PARAMS, str(tmp_path / "faulted"),
                        fetch_concurrency=2)
    monkeypatch.delenv("GRAFT_FETCH_FAULT_DIR")

    assert os.path.exists(fault_dir / "died"), \
        "failpoint never fired — the wave ran driver-local?"
    for t in TABLES:
        a, b = _norm(base.read(t)), _norm(faulted.read(t))
        pd.testing.assert_frame_equal(a, b), t
