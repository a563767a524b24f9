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


def test_query_runs(ray_session):
    from crawler_ray.pipelines.queries import near_dup_clusters

    out = near_dup_clusters("/root/testdata/sf0.001")
    # every cluster in the output has >= 2 members (built from pairs)
    if len(out):
        sizes = out.groupby("cluster_id").size()
        assert (sizes >= 2).all()
