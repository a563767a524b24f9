"""Distributed prefix-scan operator (functions/scan.py) and the
repetition-stats kernel behind doc_repetition."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from crawler_ray.functions import scan, textops


@pytest.fixture(scope="module")
def shuffled_ints(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(42)
    n = 20_000
    df = pd.DataFrame({"k": rng.permutation(n),
                       "v": rng.integers(0, 1000, n)})
    return df, rd.from_pandas(df).repartition(13)


def test_cumsum_inclusive_matches_numpy(shuffled_ints):
    df, ds = shuffled_ints
    out = (scan.cumulative_sum_ds(ds, ["k"], "v", out_col="cs")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = df.sort_values("k")["v"].cumsum().to_numpy()
    assert out["cs"].dtype == np.int64
    np.testing.assert_array_equal(out["cs"].to_numpy(), exp)


def test_cumsum_exclusive_shifts_by_own_value(shuffled_ints):
    df, ds = shuffled_ints
    out = (scan.cumulative_sum_ds(ds, ["k"], "v", out_col="cs", exclusive=True)
           .to_pandas().sort_values("k").reset_index(drop=True))
    srt = df.sort_values("k")
    exp = srt["v"].cumsum().to_numpy() - srt["v"].to_numpy()
    np.testing.assert_array_equal(out["cs"].to_numpy(), exp)
    assert out["cs"].iloc[0] == 0


def test_cumsum_float_and_single_block(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"k": np.arange(500), "v": rng.random(500)})
    out = (scan.cumulative_sum_ds(rd.from_pandas(df), ["k"], "v", out_col="cs")
           .to_pandas().sort_values("k"))
    assert out["cs"].dtype == np.float64
    np.testing.assert_allclose(out["cs"].to_numpy(), df["v"].cumsum().to_numpy(),
                               rtol=1e-12)


def test_cumsum_multi_column_order(ray_session):
    """Composite (date-like, id) order key — the running_revenue shape."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 5_000
    df = pd.DataFrame({
        "d": rng.integers(0, 50, n),          # coarse key with heavy ties
        "id": rng.permutation(n),             # unique tiebreaker
        "v": rng.integers(1, 10, n),
    })
    out = (scan.cumulative_sum_ds(rd.from_pandas(df).repartition(9),
                                  ["d", "id"], "v", out_col="cs")
           .to_pandas().sort_values(["d", "id"]).reset_index(drop=True))
    exp = df.sort_values(["d", "id"])["v"].cumsum().to_numpy()
    np.testing.assert_array_equal(out["cs"].to_numpy(), exp)


def test_repetition_stats_vs_loop_reference():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(20)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 60)))
             for _ in range(200)]
    b = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
    got = textops.repetition_stats(b).sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        from collections import Counter
        c = Counter(toks)
        assert got["n_tokens"].iloc[i] == len(toks)
        assert got["dup_frac"].iloc[i] == 1.0 - len(c) / len(toks)
        assert got["top_share"].iloc[i] == max(c.values()) / len(toks)
        flag = (1.0 - len(c) / len(toks) > 0.75) or (max(c.values()) / len(toks) > 0.2)
        assert got["flagged"].iloc[i] == int(flag)


def test_grouped_cumsum_straddling_and_tiny_groups(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(19)
    n = 15_000
    for n_groups in (10, 7_000):   # mega-groups straddle blocks; tiny ones don't
        df = pd.DataFrame({"g": rng.integers(0, n_groups, n),
                           "t": rng.permutation(n),
                           "v": rng.integers(1, 9, n)})
        out = (scan.grouped_cumulative_sum_ds(
                   rd.from_pandas(df).repartition(11), "g", ["t"], "v",
                   out_col="cs")
               .to_pandas().sort_values(["g", "t"]).reset_index(drop=True))
        exp = df.sort_values(["g", "t"]).groupby("g")["v"].cumsum().to_numpy()
        np.testing.assert_array_equal(out["cs"].to_numpy(), exp)


def _sessionize_loop(df: pd.DataFrame, gap: int) -> np.ndarray:
    """Straight-line per-row reference: new session on group change or
    strict gap excess; ids count per group from 1."""
    srt = df.sort_values(["g", "t", "i"]).reset_index(drop=True)
    sid, prev_g, prev_t, cur = [], None, None, 0
    for g, t in zip(srt["g"], srt["t"]):
        if prev_g is None or g != prev_g:
            cur = 1
        elif t - prev_t > gap:
            cur += 1
        sid.append(cur)
        prev_g, prev_t = g, t
    return srt, np.asarray(sid, np.int64)


def test_sessionize_matches_loop_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(31)
    n = 12_000
    for n_groups in (6, 3_000):   # mega-groups straddle blocks; tiny don't
        df = pd.DataFrame({"g": rng.integers(0, n_groups, n),
                           "t": rng.integers(0, 500, n).astype(np.int64),
                           "i": rng.permutation(n)})
        out = (scan.sessionize_ds(rd.from_pandas(df).repartition(11),
                                  "g", "t", "i", gap=20)
               .to_pandas().sort_values(["g", "t", "i"]).reset_index(drop=True))
        srt, exp = _sessionize_loop(df, 20)
        assert out["session_id"].dtype == np.int64
        np.testing.assert_array_equal(out["session_id"].to_numpy(), exp)


def test_sessionize_equal_gap_stays_in_session(ray_session):
    import ray.data as rd

    # deltas exactly == gap must NOT break; delta == gap+1 must
    df = pd.DataFrame({"g": np.zeros(5, np.int64),
                       "t": np.array([0, 10, 20, 31, 41], np.int64),
                       "i": np.arange(5, dtype=np.int64)})
    out = (scan.sessionize_ds(rd.from_pandas(df).repartition(3),
                              "g", "t", "i", gap=10)
           .to_pandas().sort_values("t"))
    np.testing.assert_array_equal(out["session_id"].to_numpy(),
                                  [1, 1, 1, 2, 2])


def test_sessionize_layout_invariance(ray_session):
    """Session ids must be identical under any block layout (the carry
    threading is the only cross-block dependency)."""
    import ray.data as rd

    rng = np.random.default_rng(37)
    df = pd.DataFrame({"g": rng.integers(0, 4, 3_000),
                       "t": rng.integers(0, 200, 3_000).astype(np.int64),
                       "i": rng.permutation(3_000)})
    outs = []
    for parts in (1, 5, 23):
        o = (scan.sessionize_ds(rd.from_pandas(df).repartition(parts),
                                "g", "t", "i", gap=7)
             .to_pandas().sort_values(["g", "t", "i"]).reset_index(drop=True))
        outs.append(o["session_id"].to_numpy())
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_grouped_cumsum_exclusive_zero_per_group_head(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(23)
    df = pd.DataFrame({"g": rng.integers(0, 25, 4_000),
                       "t": rng.permutation(4_000),
                       "v": rng.integers(1, 9, 4_000)})
    out = (scan.grouped_cumulative_sum_ds(
               rd.from_pandas(df).repartition(7), "g", ["t"], "v",
               out_col="cs", exclusive=True)
           .to_pandas().sort_values(["g", "t"]).reset_index(drop=True))
    srt = df.sort_values(["g", "t"])
    exp = srt.groupby("g")["v"].cumsum().to_numpy() - srt["v"].to_numpy()
    np.testing.assert_array_equal(out["cs"].to_numpy(), exp)
    heads = out.groupby("g").head(1)
    assert (heads["cs"] == 0).all()
