"""Connected-components clustering of verified near-dup pairs."""

import numpy as np
import pandas as pd

from crawler_ray.functions.dedup_ops import connected_components


def test_chain_and_separate_components():
    pairs = pd.DataFrame({"doc_a": np.array([1, 2, 10], np.int64),
                          "doc_b": np.array([2, 3, 11], np.int64)})
    out = connected_components(pairs)
    lab = dict(zip(out["doc_id"], out["cluster_id"]))
    assert lab[1] == lab[2] == lab[3] == 1
    assert lab[10] == lab[11] == 10


def test_long_chain_converges():
    n = 50
    pairs = pd.DataFrame({"doc_a": np.arange(n - 1, dtype=np.int64),
                          "doc_b": np.arange(1, n, dtype=np.int64)})
    out = connected_components(pairs)
    assert (out["cluster_id"] == 0).all()


def _planted_graph(n_nodes: int, seed: int = 11) -> pd.DataFrame:
    """~n_nodes nodes in planted clusters of mixed shape: 5-chains (diameter
    stress) and 8-stars, with shuffled ids so cluster members never share a
    block after any sort."""
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n_nodes).astype(np.int64) * 7 + 3  # sparse ids
    a, b, i = [], [], 0
    while i + 8 <= n_nodes:
        if (i // 8) % 2 == 0:  # chain of 4 + chain of 4 (diameter 3)
            a.extend(ids[i:i + 3]); b.extend(ids[i + 1:i + 4])
            a.extend(ids[i + 4:i + 7]); b.extend(ids[i + 5:i + 8])
        else:  # star of 8 (diameter 2)
            a.extend([ids[i]] * 7); b.extend(ids[i + 1:i + 8])
        i += 8
    return pd.DataFrame({"doc_a": np.array(a, np.int64),
                         "doc_b": np.array(b, np.int64)})


def test_distributed_matches_inmemory_100k_nodes(ray_session):
    import ray.data as rd

    from crawler_ray.functions.dedup_ops import connected_components_ds

    pairs = _planted_graph(100_000)
    mem = connected_components(pairs).sort_values("doc_id").reset_index(drop=True)
    dist = (connected_components_ds(rd.from_pandas(pairs).repartition(16),
                                    num_partitions=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(mem, dist)


def test_size_switch_routes_to_distributed(ray_session, monkeypatch):
    from crawler_ray.functions import dedup_ops

    pairs = _planted_graph(800)
    expect = connected_components(pairs, all_ids=[1_000_001, 1_000_002])
    monkeypatch.setattr(dedup_ops, "CC_INMEM_PAIR_LIMIT", 0)
    routed = dedup_ops.connected_components(pairs, all_ids=[1_000_001, 1_000_002])
    pd.testing.assert_frame_equal(
        expect.sort_values("doc_id").reset_index(drop=True),
        routed.sort_values("doc_id").reset_index(drop=True))


def test_query_runs(ray_session):
    from crawler_ray.pipelines.queries import near_dup_clusters

    out = near_dup_clusters("/root/testdata/sf0.001")
    # every cluster in the output has >= 2 members (built from pairs)
    if len(out):
        sizes = out.groupby("cluster_id").size()
        assert (sizes >= 2).all()
