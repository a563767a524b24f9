"""Crawl-audit queries: the politeness budget and per-wave counters as
data, checked against golden parquet plus their own invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd

GOLDEN = "/root/repo/golden"


def test_host_politeness_audit(ray_session):
    import __ray_entry__ as e

    out = e.queries()["host_politeness_audit"]("/root/testdata/sf0.001")
    exp = pd.read_parquet(f"{GOLDEN}/host_politeness_audit.parquet")
    pd.testing.assert_frame_equal(out, exp)
    # the virtual politeness clock schedules fetches at exactly the delay:
    # every multi-fetch (host, wave) group has min_gap == max_gap == delay
    multi = out[out["n_fetches"] > 1]
    assert len(multi) > 0
    assert (multi["min_gap_us"] == multi["delay_us"]).all()
    assert (multi["max_gap_us"] == multi["delay_us"]).all()
    assert (out["ok"] == 1).all()


def test_crawl_wave_summary_conservation(ray_session):
    import __ray_entry__ as e

    out = e.queries()["crawl_wave_summary"]("/root/testdata/sf0.001")
    exp = pd.read_parquet(f"{GOLDEN}/crawl_wave_summary.parquet")
    pd.testing.assert_frame_equal(out, exp)
    run = e._crawl_run("queries")
    assert int(out["n_scheduled"].sum()) == run.read("order").num_rows
    assert int(out["n_pages"].sum()) == run.read("pages").num_rows
    assert int(out["n_dlq"].sum()) == run.read("dlq").num_rows
    st = run.read("store")
    assert int(out["n_images"].sum()) == st.num_rows
    px = (np.asarray(st["w"], dtype=np.int64)
          * np.asarray(st["h"], dtype=np.int64)).sum()
    assert int(out["total_pixels"].sum()) == int(px)
