"""Window-navigation wave: distributed LAG (scan.grouped_lag_ds),
latest-record-per-key CDC dedup, DENSE_RANK top-k-with-ties — each vs its
DuckDB oracle at sf0.001 plus kernel-level invariance units."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "orders"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _check(name: str, con) -> pd.DataFrame:
    from crawler_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES[name](SF)
    exp = con.execute(ORACLE_SQL[name]).df()
    a, b = _norm(got), _norm(exp)
    assert list(a.columns) == list(b.columns), (a.columns, b.columns)
    assert len(a) == len(b), (name, len(a), len(b))
    for c in a.columns:
        bb = b[c].astype(a[c].dtype) if a[c].dtype != b[c].dtype else b[c]
        assert (a[c].to_numpy() == bb.to_numpy()).all(), (name, c)
    return got


def test_lag_event_delta(ray_session, con):
    _check("lag_event_delta", con)


def test_latest_event_per_user(ray_session, con):
    out = _check("latest_event_per_user", con)
    # one row per user; n_events conserves the table
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    assert len(out) == ev["user_id"].nunique()
    assert int(out["n_events"].sum()) == len(ev)


def test_dense_rank_top_prices(ray_session, con):
    out = _check("dense_rank_top_prices", con)
    assert set(out["dr"]) <= {1, 2, 3}


def test_grouped_lag_layout_invariance(ray_session):
    """The O(blocks) seam carry must make LAG identical under any block
    layout — force many tiny blocks so groups straddle boundaries."""
    from crawler_ray.functions import scan

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": rng.integers(0, 5, 300),
        "o": np.arange(300, dtype=np.int64),
        "v": rng.normal(size=300)})
    wide = scan.grouped_lag_ds(rd.from_pandas(df), "g", ["o"], "v").to_pandas()
    narrow = scan.grouped_lag_ds(rd.from_pandas(df).repartition(37),
                                 "g", ["o"], "v").to_pandas()
    key = ["g", "o"]
    a = wide.sort_values(key).reset_index(drop=True)
    b = narrow.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # loop reference
    ref = df.sort_values(key).reset_index(drop=True)
    prev: dict = {}
    exp = []
    for r in ref.itertuples(index=False):
        exp.append(prev.get(r.g, np.nan))
        prev[r.g] = r.v
    got = a["prev_value"].to_numpy()
    exp = np.asarray(exp)
    assert ((np.isnan(got) & np.isnan(exp)) | (got == exp)).all()


def test_event_transition_matrix(ray_session, con):
    out = _check("event_transition_matrix", con)
    # transitions conserve: n across all cells == events - streams
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    assert int(out["n"].sum()) == len(ev) - ev["user_id"].nunique()


def test_grouped_lag_object_path(ray_session):
    """String LAG (object dtype) must match the loop reference under a
    boundary-heavy layout."""
    from crawler_ray.functions import scan

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": rng.integers(0, 4, 200),
        "o": np.arange(200, dtype=np.int64),
        "v": np.array([f"s{int(x)}" for x in rng.integers(0, 3, 200)],
                      dtype=object)})
    got = (scan.grouped_lag_ds(rd.from_pandas(df).repartition(29),
                               "g", ["o"], "v", out_col="p").to_pandas()
           .sort_values(["g", "o"]).reset_index(drop=True))
    prev: dict = {}
    exp = []
    for r in df.sort_values(["g", "o"]).itertuples(index=False):
        exp.append(prev.get(r.g))
        prev[r.g] = r.v
    assert list(got["p"]) == exp


def test_user_retention_cohorts(ray_session, con):
    out = _check("user_retention_cohorts", con)
    # offset-0 row of each cohort counts the whole cohort: column sums
    # conserve users
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    zero = out[out["week_offset"] == 0]
    assert int(zero["n_users"].sum()) == ev["user_id"].nunique()
    # no cell can exceed its cohort's size
    size = dict(zip(zero["cohort_week"], zero["n_users"]))
    assert (out["n_users"] <= out["cohort_week"].map(size)).all()


def test_event_funnel(ray_session, con):
    out = _check("event_funnel", con)
    # funnel is monotone and conversion is the exact ppm ratio
    n1, n2, n3 = (int(out[c].iloc[0]) for c in ("n_stage1", "n_stage2", "n_stage3"))
    assert n1 >= n2 >= n3 > 0
    assert int(out["conv_ppm"].iloc[0]) == n3 * 10**6 // n1


def test_event_funnel_order_matters(ray_session):
    """A user whose purchase PRECEDES the click must not convert: planted
    micro-fixture through the same per-block kernel semantics."""
    import duckdb

    from crawler_ray.pipelines.queries import ORACLE_SQL

    c = duckdb.connect()
    c.execute("""CREATE VIEW events AS SELECT * FROM (VALUES
        (1, TIMESTAMP '2025-01-01 00:00:00', 'view'),
        (1, TIMESTAMP '2025-01-01 00:02:00', 'purchase'),
        (1, TIMESTAMP '2025-01-01 00:03:00', 'click'),
        (2, TIMESTAMP '2025-01-01 00:00:00', 'view'),
        (2, TIMESTAMP '2025-01-01 00:01:00', 'click'),
        (2, TIMESTAMP '2025-01-01 00:02:00', 'purchase'))
        t(user_id, ts, event_type)""")
    r = c.execute(ORACLE_SQL["event_funnel"]).df()
    # user 1: view->purchase->click = no stage-3; user 2 converts fully
    assert int(r["n_stage1"].iloc[0]) == 2
    assert int(r["n_stage2"].iloc[0]) == 2
    assert int(r["n_stage3"].iloc[0]) == 1
