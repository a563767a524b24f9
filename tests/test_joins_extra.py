"""As-of join + interval (range) join vs DuckDB at sf0.001.

The as-of join is the distributed sort+ffill formulation (one global sort
shuffle, per-block vectorized forward fill, driver seam fold); the range
join is bin replication + hash join. Both must be value-identical to the
straight SQL semantics.
"""

from __future__ import annotations

import duckdb

from crawler_ray.pipelines.queries import ORACLE_SQL, QUERIES

SF = "/root/testdata/sf0.001"


def _oracle(name: str):
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(ORACLE_SQL[name]).df()


def _norm(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_asof_join_quotes_matches_duckdb(ray_session):
    eng, ora = _norm(QUERIES["asof_join_quotes"](SF)), _norm(_oracle("asof_join_quotes"))
    assert len(eng) == len(ora) > 0
    # the sf0.001 slice must exercise both the matched and the no-quote-yet
    # (NULL → -1) paths, or the fixture has drifted under the test
    assert (eng["asof_price"] == -1.0).any()
    assert (eng["asof_price"] != -1.0).any()
    assert eng.equals(ora)


def test_events_in_windows_matches_duckdb(ray_session):
    eng, ora = _norm(QUERIES["events_in_windows"](SF)), _norm(_oracle("events_in_windows"))
    assert len(eng) == len(ora) > 0
    assert eng.equals(ora)


def test_asof_fold_tie_run_straddling_blocks():
    """The MAX tie rule must hold even when equal-(key,time) right rows are
    split across sorted blocks: a left in the later block that fills from
    the PARTIAL in-block max must be re-resolved at the driver, where the
    head-state piece meets the previous block's tail piece. Drives the fold
    protocol exactly as asof_join does, with a hand-placed block split."""
    import numpy as np
    import pandas as pd

    from crawler_ray.functions.joins import _asof_fold, _COLS

    def right(k, t, val):
        return dict(k=k, t=t, side=np.int8(0), left_id=-1, val=float(val))

    def left(k, t, lid):
        return dict(k=k, t=t, side=np.int8(1), left_id=lid, val=np.nan)

    # global sort order: R(5,100,10) R(5,100,3) | R(5,100,4) L(5,150)
    # block boundary splits the (5,100) run; true answer = max = 10
    block1 = pd.DataFrame([right(5, 100, 10), right(5, 100, 3)])[_COLS]
    block2 = pd.DataFrame([right(5, 100, 4), left(5, 150, 77)])[_COLS]
    folded = pd.concat([_asof_fold(block1), _asof_fold(block2)], ignore_index=True)

    is_left = folded["side"].to_numpy() == 1
    unresolved = folded["u"].to_numpy() == 1
    # the left filled from the straddled instant ⇒ must NOT resolve in-block
    assert not len(folded.loc[is_left & ~unresolved])
    seam = _asof_fold(folded.loc[~is_left | unresolved, _COLS], final=True)
    out = seam.loc[seam["side"].to_numpy() == 1]
    assert len(out) == 1 and out["left_id"].iloc[0] == 77
    assert out["val"].iloc[0] == 10.0  # not the later block's partial 4

    # control: no straddle (run fully in one block) resolves in-block to 10
    one = _asof_fold(pd.concat([block1, block2], ignore_index=True))
    lefts = one.loc[(one["side"] == 1) & (one["u"] == 0)]
    # (block starts with a right ⇒ still conservatively deferred; final fold
    # over everything must agree)
    allr = _asof_fold(pd.concat([block1, block2], ignore_index=True)[_COLS], final=True)
    got = allr.loc[allr["side"] == 1, "val"]
    assert list(got) == [10.0]
    assert len(lefts) == 0 or list(lefts["val"]) == [10.0]


def test_asof_fold_protocol_randomized():
    """Property test of the seam protocol itself, no Ray: random tagged
    streams cut at RANDOM block boundaries (the part Ray's block layout
    makes non-deterministic in production) must reproduce pandas
    merge_asof on the (key,time)-max-reduced rights — every seed, every
    cut, including tie runs sliced mid-run."""
    import numpy as np
    import pandas as pd

    from crawler_ray.functions.joins import _COLS, _asof_fold

    for seed in range(25):
        rng = np.random.default_rng(seed)
        n_l, n_r = 200, 120
        # tiny domains force heavy key/time collisions and tie runs
        lefts = pd.DataFrame({"k": rng.integers(0, 6, n_l), "t": rng.integers(0, 25, n_l),
                              "side": np.int8(1), "left_id": np.arange(n_l),
                              "val": np.nan})
        rights = pd.DataFrame({"k": rng.integers(0, 6, n_r), "t": rng.integers(0, 25, n_r),
                               "side": np.int8(0), "left_id": np.int64(-1),
                               "val": rng.integers(0, 100, n_r).astype(np.float64)})
        allrows = (pd.concat([lefts, rights], ignore_index=True)[_COLS]
                   .sort_values(["k", "t", "side"], kind="mergesort").reset_index(drop=True))
        # random block cuts (1..8 blocks)
        n_cuts = int(rng.integers(0, 8))
        cuts = np.sort(rng.integers(1, len(allrows), n_cuts)) if n_cuts else np.array([], int)
        blocks = np.split(allrows, cuts)
        folded = pd.concat([_asof_fold(b.reset_index(drop=True)) for b in blocks if len(b)],
                           ignore_index=True)
        is_left = folded["side"].to_numpy() == 1
        u = folded["u"].to_numpy() == 1
        done = folded.loc[is_left & ~u]
        seam = _asof_fold(folded.loc[~is_left | u, _COLS], final=True)
        got = (pd.concat([done, seam.loc[seam["side"] == 1]], ignore_index=True)
               [["left_id", "val"]].sort_values("left_id").reset_index(drop=True))

        red = rights.groupby(["k", "t"], as_index=False)["val"].max()
        want = pd.merge_asof(lefts.sort_values("t", kind="mergesort"),
                             red.sort_values("t", kind="mergesort"),
                             on="t", by="k", direction="backward",
                             suffixes=("_x", ""))
        want = want[["left_id", "val"]].sort_values("left_id").reset_index(drop=True)
        assert len(got) == n_l, f"seed {seed}: lost/duplicated lefts"
        a = got["val"].fillna(-1).to_numpy()
        b = want["val"].fillna(-1).to_numpy()
        assert np.array_equal(a, b), f"seed {seed}: {np.flatnonzero(a != b)[:5]}"


def test_asof_broadcast_equals_distributed(ray_session):
    """The small-side broadcast variant (ray.put + per-batch merge_asof)
    must agree row-for-row with the big⋈big sort+ffill operator on the
    same inputs, including the max tie rule and no-predecessor NULLs."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from crawler_ray.functions.joins import asof_join, asof_join_broadcast

    rng = np.random.default_rng(99)
    n_l, n_r, n_k = 20_000, 5_000, 300
    left = pd.DataFrame({"event_id": np.arange(n_l, dtype=np.int64),
                         "user_id": rng.integers(0, n_k, n_l).astype(np.int64),
                         "t": rng.integers(0, 100_000, n_l).astype(np.int64)})
    right = pd.DataFrame({"k": rng.integers(0, n_k, n_r).astype(np.int64),
                          "rt": rng.integers(0, 100_000, n_r).astype(np.int64),
                          "price": (rng.random(n_r) * 100).round(2)})
    # plant (k, rt) ties to exercise the max rule in both paths
    right.loc[:500, ["k", "rt"]] = right.loc[501:1001, ["k", "rt"]].to_numpy()

    big = asof_join(rd.from_pandas(left).repartition(8),
                    rd.from_pandas(right).repartition(4),
                    left_id="event_id", key="user_id", time="t",
                    right_key="k", right_time="rt", right_value="price")
    small = (asof_join_broadcast(rd.from_pandas(left).repartition(8), right,
                                 key="user_id", time="t", right_key="k",
                                 right_time="rt", right_value="price")
             .to_pandas())
    a = big.sort_values("event_id").reset_index(drop=True)
    b = small.sort_values("event_id").reset_index(drop=True)
    assert len(a) == len(b) == n_l
    assert np.array_equal(a["user_id"].to_numpy(), b["user_id"].to_numpy())
    assert np.allclose(a["price"].fillna(-1).to_numpy(),
                       b["price"].fillna(-1).to_numpy(), rtol=0, atol=0)
    assert a["price"].isna().any()  # NULL path exercised


def test_asof_join_adversarial_seams(ray_session, tmp_path):
    """Stress the sort+ffill seam machinery with data built to straddle
    blocks: few hot keys (a single key spans many sorted blocks), exact
    timestamp ties between events and quotes (inclusive match), events
    before any quote (NULL), keys with no quotes at all, and duplicate
    (key, time) quotes (max-price tie rule). Oracle = the same ASOF SQL
    over the synthetic tables."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(1234)
    n_ev, n_q = 60_000, 20_000
    t0 = pd.Timestamp("2024-01-01").value // 1000  # µs

    # hot-key mixture: half the events on 3 keys, rest across 0..299
    # (user_id ≥ 150 can never match a quote ⇒ permanent-NULL path)
    user = np.where(rng.random(n_ev) < 0.5,
                    rng.choice([7, 42, 149], n_ev),
                    rng.integers(0, 300, n_ev))
    ev_ts = t0 + rng.integers(0, 2_592_000, n_ev) * 1_000_000
    events = pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pd.to_datetime(ev_ts, unit="us"),
        "user_id": user.astype(np.int64),
        "event_type": "x", "value": 1.0, "props": "{}"})

    okey = rng.integers(0, 1 << 20, n_q).astype(np.int64)
    okey[:2000] = okey[0]  # mass of duplicate (key,time) quotes → tie rule
    orders = pd.DataFrame({
        "o_orderkey": okey,
        "o_custkey": rng.integers(0, 1500, n_q).astype(np.int64),
        "o_orderstatus": "O",
        "o_totalprice": (rng.random(n_q) * 9000 + 900).round(2),
        "o_orderdate": pd.Timestamp("1995-06-01"),
        "o_orderpriority": "1-URGENT"})
    # exact-tie events: event ts equal to a quote instant must match it
    qts = (t0 + ((okey[:500] * 9973) % 2_592_000) * 1_000_000)
    events.loc[:499, "ts"] = pd.to_datetime(qts, unit="us")
    events.loc[:499, "user_id"] = (orders["o_custkey"].to_numpy()[:500] % 150)

    sf = str(tmp_path)
    events.to_parquet(f"{sf}/events.parquet", index=False)
    orders.to_parquet(f"{sf}/orders.parquet", index=False)

    con = duckdb.connect()
    for t in ("events", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    ora = _norm(con.sql(ORACLE_SQL["asof_join_quotes"]).df())
    eng = _norm(QUERIES["asof_join_quotes"](sf))
    assert len(eng) == len(ora) == n_ev
    assert (eng["asof_price"] == -1.0).any()  # NULL path exercised
    assert eng.equals(ora)
