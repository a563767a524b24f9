"""late_event_stats + grouped_cumulative_max_ds — planted out-of-order
events, cross-block watermark carry, tie semantics (t == watermark is NOT
late), vs a straight-line per-stream loop."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.functions import scan
from crawler_ray.pipelines import queries


def _events_frame():
    """User 1: long in-order stream with planted regressions (spans many
    blocks after the sort). User 2: fully ordered. User 3: one event (no
    predecessor). User 4: exact tie with its watermark."""
    rows = []
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    eid = 0
    for i in range(500):
        t = t0 + np.timedelta64(i * 1_000_000, "us")
        if i % 50 == 7:
            t = t0 + np.timedelta64((i - 30) * 1_000_000, "us")  # 30 s late
        rows.append((eid, t, 1, "click"))
        eid += 1
    for i in range(100):
        rows.append((eid, t0 + np.timedelta64(i, "s"), 2, "view"))
        eid += 1
    rows.append((eid, t0, 3, "view")); eid += 1
    rows.append((eid, t0 + np.timedelta64(5, "s"), 4, "click")); eid += 1
    rows.append((eid, t0 + np.timedelta64(5, "s"), 4, "click")); eid += 1  # tie
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def _loop_reference(df: pd.DataFrame) -> pd.DataFrame:
    stats: dict[str, list[int]] = {}
    for _, g in df.groupby("user_id"):
        g = g.sort_values("event_id")
        wm = None
        for r in g.itertuples(index=False):
            t = int(np.datetime64(r.ts, "us").view("int64"))
            s = stats.setdefault(r.event_type, [0, 0, 0, 0])
            s[0] += 1
            if wm is not None and t < wm:
                s[1] += 1
                s[2] = max(s[2], wm - t)
                s[3] += wm - t
            wm = t if wm is None else max(wm, t)
    out = pd.DataFrame([(k, *v) for k, v in sorted(stats.items())],
                       columns=["event_type", "n_events", "n_late",
                                "max_late_us", "sum_late_us"])
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out


def test_matches_loop_reference(ray_session, tmp_path):
    df = _events_frame()
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(
        df.assign(value=1.0, props="{}"), preserve_index=False),
        str(d / "events.parquet"))
    got = queries.late_event_stats(str(d))
    exp = _loop_reference(df)
    got["event_type"] = got["event_type"].astype(str)
    pd.testing.assert_frame_equal(got, exp)
    assert int(got.set_index("event_type").loc["click", "n_late"]) == 10
    # the t == watermark tie is NOT late
    assert int(got.set_index("event_type").loc["view", "n_late"]) == 0


def test_grouped_cummax_cross_block_carry(ray_session):
    """A single group spread over many tiny blocks: every row's exclusive
    running max must thread through the block chain."""
    import ray.data as rd

    n = 400
    v = np.arange(n, dtype=np.int64)
    v[n // 2] = 10_000   # spike mid-stream; later rows see it as the max
    df = pd.DataFrame({"g": np.zeros(n, np.int64),
                       "o": np.arange(n, dtype=np.int64), "v": v})
    ds = rd.from_pandas(df).repartition(13)
    out = (scan.grouped_cumulative_max_ds(ds, "g", ["o"], "v", out_col="pm")
           .to_pandas().sort_values("o"))
    exp = np.concatenate([[scan.NEG_INF_I64],
                          np.maximum.accumulate(v)[:-1]])
    assert (out["pm"].to_numpy(np.int64) == exp).all()
