"""Distributed exact covariance/PCA: moment-fold exactness (incl. past
int64), distributed==local equality, eigensolve sanity, golden query."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawler_ray.functions import linalg


def _rand_emb(n=300, d=16, seed=2):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return X


def test_moment_fold_matches_direct():
    X = _rand_emb()
    b = pd.DataFrame({"embedding": list(X)})
    parts = pd.concat([linalg.moment_partial(b.iloc[:100]),
                       linalg.moment_partial(b.iloc[100:250]),
                       linalg.moment_partial(b.iloc[250:])], ignore_index=True)
    n, s, S = linalg.fold_moments(parts, 16)
    q = np.floor(X.astype(np.float64) * linalg.DEFAULT_SCALE).astype(np.int64)
    assert n == len(X)
    assert (s == q.sum(0)).all()
    assert (S == q.T @ q).all()
    m2 = linalg.scaled_covariance(n, s, S)
    assert (m2 == n * (q.T @ q) - np.outer(q.sum(0), q.sum(0))).all()


def test_fold_is_exact_past_int64():
    # partials CLAIMING 2^40 rows each: n·S exceeds int64 — the object-int
    # fold must stay exact where a vectorized int64 fold would wrap
    d = 4
    S = (np.ones((d, d), np.int64) * (1 << 40)).tobytes()
    s = (np.ones(d, np.int64) * (1 << 30)).tobytes()
    parts = pd.DataFrame({"n": np.array([1 << 40, 1 << 40], np.int64),
                          "s": [s, s], "S": [S, S]})
    n, sv, Sv = linalg.fold_moments(parts, d)
    m2 = linalg.scaled_covariance(n, sv, Sv)
    expect = (1 << 41) * (1 << 41) - (1 << 31) * (1 << 31)
    assert m2[0, 0] == expect and expect > np.iinfo(np.int64).max


def test_top_eigs_on_known_matrix():
    A = np.diag([10.0, 5.0, 1.0, 0.5])
    vals, vecs = linalg.top_eigs(A, k=2)
    assert np.allclose(vals, [10.0, 5.0])
    assert np.allclose(np.abs(vecs[0]), [1, 0, 0, 0])
    # eigval sum over all k equals the trace
    allv, _ = linalg.top_eigs(A, k=4)
    assert np.isclose(allv.sum(), np.trace(A))


def test_distributed_moments_equal_local(ray_session):
    import ray.data as rd

    X = _rand_emb(n=500)
    ds = rd.from_pandas(pd.DataFrame({"embedding": list(X)})).repartition(8)
    parts = ds.map_batches(linalg.moment_partial, batch_format="pandas").to_pandas()
    n, s, S = linalg.fold_moments(parts, 16)
    q = np.floor(X.astype(np.float64) * linalg.DEFAULT_SCALE).astype(np.int64)
    assert n == 500 and (s == q.sum(0)).all() and (S == q.T @ q).all()


def test_embedding_pca_matches_golden(ray_session):
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.queries import embedding_pca

    got = embedding_pca("/root/testdata/sf0.01")
    golden = pq.read_table("/root/repo/golden/embedding_pca.parquet").to_pandas()
    pd.testing.assert_frame_equal(got, golden)
