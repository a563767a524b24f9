"""Size-aware fact⋈dim attach: broadcast-dict and distributed-hash-join
paths of queries._attach_dim must be interchangeable (VERDICT r3 #6)."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("qname", ["orders_join", "top_orders_per_segment"])
def test_dim_join_switch_paths_agree(ray_session, monkeypatch, qname):
    from crawler_ray.pipelines import queries

    fn = queries.QUERIES[qname]
    via_broadcast = fn(SF)  # customer at sf0.001 is far below the limit
    monkeypatch.setattr(queries, "DIM_BROADCAST_ROW_LIMIT", 0)
    via_join = fn(SF)
    pd.testing.assert_frame_equal(
        via_broadcast.reset_index(drop=True), via_join.reset_index(drop=True))
