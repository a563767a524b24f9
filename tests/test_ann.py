"""ANN: brute-force exactness vs numpy oracle; LSH recall sanity."""

import numpy as np
import pandas as pd
import pytest

from crawler_ray.functions import ann


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    d = 16
    mat = rng.standard_normal((200, d)).astype(np.float32)
    qmat = rng.standard_normal((3, d))
    return mat, {"qid": np.arange(3, dtype=np.int64), "mat": qmat}


def _numpy_topk(mat, queries, k=10):
    t = mat.astype(np.float64)
    t = t / np.linalg.norm(t, axis=1, keepdims=True)
    q = queries["mat"] / np.linalg.norm(queries["mat"], axis=1, keepdims=True)
    sims = t @ q.T
    out = {}
    for j, qid in enumerate(queries["qid"]):
        order = np.lexsort((np.arange(len(t)), -sims[:, j]))[:k]
        out[int(qid)] = list(order)
    return out


def test_brute_force_matches_numpy(ray_session, corpus):
    import ray
    import ray.data as rd

    mat, queries = corpus
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(mat), dtype=np.int64),
        "embedding": [v for v in mat],
    })).repartition(4)
    got = ann.brute_force_topk(ds, ray.put(queries), k=10).to_pandas()
    want = _numpy_topk(mat, queries)
    for qid, vids in want.items():
        g = got[got["qid"] == qid].sort_values(["sim", "vid"], ascending=[False, True])
        assert g["vid"].tolist() == vids


def test_lsh_recall_on_clustered_data(ray_session):
    # plant 10 true near-neighbors (query + small noise) per query among
    # random distractors — hyperplane LSH must recover most of them
    import ray.data as rd

    rng = np.random.default_rng(9)
    d, n_q, n_near = 16, 3, 10
    qmat = rng.standard_normal((n_q, d))
    planted = np.concatenate([
        q + 0.05 * rng.standard_normal((n_near, d)) for q in qmat
    ])
    distractors = rng.standard_normal((300, d))
    mat = np.concatenate([planted, distractors]).astype(np.float32)
    queries = {"qid": np.arange(n_q, dtype=np.int64), "mat": qmat}
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(mat), dtype=np.int64),
        "embedding": [v for v in mat],
    })).repartition(4)
    got = ann.lsh_topk(ds, queries, k=n_near, bits=8, d=d).to_pandas()
    recalls = []
    for j in range(n_q):
        truth = set(range(j * n_near, (j + 1) * n_near))
        g = set(got[got["qid"] == j]["vid"].tolist())
        recalls.append(len(g & truth) / n_near)
    assert np.mean(recalls) >= 0.6


def test_ivf_topk_recall(ray_session):
    """IVF probe search: valid top-k shape, and recall@10 vs brute force
    stays useful at nprobe/nlist = 1/4 of the corpus."""
    import ray
    import ray.data as rd

    from crawler_ray.functions import ann

    rng = np.random.default_rng(9)
    mat = rng.standard_normal((400, 16))
    df = pd.DataFrame({"vec_id": np.arange(400, dtype=np.int64),
                       "embedding": [v.astype(np.float32).tolist() for v in mat]})
    queries = {"qid": np.arange(3, dtype=np.int64), "mat": mat[:3].astype(np.float64)}
    ds = rd.from_pandas(df).repartition(4)
    exact = ann.brute_force_topk(ds, ray.put(queries), k=10).to_pandas()
    approx = ann.ivf_topk(ds, queries, k=10, nlist=16, nprobe=4).to_pandas()
    assert set(approx["qid"]) == {0, 1, 2}
    assert (approx.groupby("qid").size() == 10).all()
    recall = len(set(zip(approx["qid"], approx["vid"]))
                 & set(zip(exact["qid"], exact["vid"]))) / len(exact)
    assert recall >= 0.5, recall
