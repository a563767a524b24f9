"""Integer-state k-means (functions/cluster.py): bit-identity vs an
independent loop, tie rule, empty-cluster rule, block-layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from crawler_ray.functions import cluster


def _loop_reference(vecs, k, n_iters, scale=10**6):
    xq = [np.rint(np.asarray(v, np.float64) * scale).astype(np.int64) for v in vecs]
    cent = [xq[i].copy() for i in range(k)]
    counts = [1] * k
    for _ in range(n_iters):
        sums = [np.zeros_like(cent[0]) for _ in range(k)]
        counts = [0] * k
        for x in xq:
            best, bd = 0, None
            for j in range(k):
                d = int(((x - cent[j]) ** 2).sum())
                if bd is None or d < bd:
                    best, bd = j, d
            sums[best] += x
            counts[best] += 1
        cent = [cent[j] if counts[j] == 0 else sums[j] // counts[j] for j in range(k)]
    return np.stack(cent), np.asarray(counts, np.int64)


@pytest.mark.parametrize("n_blocks", [1, 7])
def test_engine_matches_loop_bitwise(ray_session, n_blocks):
    import ray.data as rd

    rng = np.random.default_rng(3)
    vecs = [rng.normal(size=16) * 0.4 for _ in range(400)]
    df = pd.DataFrame({"vec_id": np.arange(400, dtype=np.int64),
                       "embedding": vecs})
    ds = rd.from_pandas(df).repartition(n_blocks)
    cent, counts = cluster.kmeans_quantized(ds, "vec_id", "embedding",
                                            k=5, n_iters=4)
    ec, en = _loop_reference(vecs, k=5, n_iters=4)
    np.testing.assert_array_equal(cent, ec)
    np.testing.assert_array_equal(counts, en)


def test_tie_goes_to_lowest_cluster():
    # centroids at -1 and +1 (scaled); a point at exactly 0 is equidistant
    cent = np.array([[10], [-10]], np.int64)
    a = cluster.assign_ids(np.array([[0]], np.int64), cent)
    assert a[0] == 0


def test_empty_cluster_keeps_centroid(ray_session):
    import ray.data as rd

    # init centroids (vec_ids 0 and 1) are IDENTICAL, so in round 1 the tie
    # rule sends every point to cluster 0 — cluster 1 empties and must keep
    # its original centroid position (it would repopulate in later rounds
    # once centroid 0 drifts to the mean, hence a single round here)
    vecs = [[1.0 + 0.001 * i] for i in range(20)]
    vecs[1] = [1.0]  # duplicate of vec_id 0
    df = pd.DataFrame({"vec_id": np.arange(20, dtype=np.int64), "embedding": vecs})
    cent, counts = cluster.kmeans_quantized(rd.from_pandas(df), "vec_id",
                                            "embedding", k=2, n_iters=1)
    assert counts[1] == 0 and counts[0] == 20
    assert cent[1, 0] == 1_000_000  # 1.0 × 10^6, untouched


def test_assign_ids_exactness_at_grid_extremes():
    # int64 exactness at the documented magnitude bound (|x| ≈ 2·scale)
    x = np.array([[2_000_000] * 64], np.int64)
    c = np.array([[-2_000_000] * 64, [2_000_000] * 64], np.int64)
    a = cluster.assign_ids(x, c)
    assert a[0] == 1
