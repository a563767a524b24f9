"""Salted skew join: planted-hot-key equality vs pandas merge, hot-set
detection, and the cold (no-hot-keys) path."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawler_ray.functions.joins import salted_join, sampled_hot_keys


def _planted(n=20_000, hot_key=7, hot_frac=0.6, seed=3):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 500, n)
    keys[: int(n * hot_frac)] = hot_key  # one key owns 60 % of the fact side
    rng.shuffle(keys)
    fact = pd.DataFrame({"k": keys, "v": rng.normal(size=n)})
    dim = pd.DataFrame({"dk": np.arange(500), "label": [f"L{i}" for i in range(500)]})
    return fact, dim


def test_sampled_hot_keys_finds_planted_key(ray_session):
    import ray.data as rd

    fact, _ = _planted()
    hot = sampled_hot_keys(rd.from_pandas(fact).repartition(8), "k",
                           threshold=len(fact) // 100)
    assert 7 in hot
    # a uniform key (~40 occurrences) must NOT be flagged at this threshold
    assert len(hot) < 10


def test_salted_join_exact_vs_pandas_merge(ray_session):
    import ray.data as rd

    fact, dim = _planted()
    expect = (fact.merge(dim, left_on="k", right_on="dk")
              .drop(columns=["dk"]).sort_values(["k", "v"]).reset_index(drop=True))
    for hot in ({7}, set()):  # salted hot path AND the cold degenerate path
        got = (salted_join(rd.from_pandas(fact).repartition(8),
                           rd.from_pandas(dim).repartition(2),
                           key="k", dim_key="dk", hot=hot, salts=4)
               .to_pandas()[["k", "v", "label"]]
               .sort_values(["k", "v"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, expect[["k", "v", "label"]])


def test_salted_join_hot_key_absent_from_dim(ray_session):
    import ray.data as rd

    # a key flagged hot but missing on the dim side must simply drop
    # (inner-join semantics), not error or duplicate
    fact = pd.DataFrame({"k": [1, 1, 1, 2, 3], "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    dim = pd.DataFrame({"dk": [2, 3], "label": ["B", "C"]})
    got = (salted_join(rd.from_pandas(fact), rd.from_pandas(dim),
                       key="k", dim_key="dk", hot={1, 2}, salts=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(got["k"]) == [2, 3] and list(got["label"]) == ["B", "C"]


def test_salted_join_duplicate_dim_keys(ray_session):
    import ray.data as rd

    # dim-side duplicates multiply matches exactly as an unsalted join does
    fact = pd.DataFrame({"k": [7] * 6 + [8], "v": np.arange(7.0)})
    dim = pd.DataFrame({"dk": [7, 7, 8], "label": ["a", "b", "c"]})
    expect = (fact.merge(dim, left_on="k", right_on="dk")
              .drop(columns=["dk"]).sort_values(["k", "v", "label"])
              .reset_index(drop=True))
    got = (salted_join(rd.from_pandas(fact), rd.from_pandas(dim),
                       key="k", dim_key="dk", hot={7}, salts=3)
           .to_pandas()[["k", "v", "label"]]
           .sort_values(["k", "v", "label"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, expect[["k", "v", "label"]])
