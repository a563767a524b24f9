"""Distributed PageRank in EXACT integer arithmetic.

Rank state is integer "units" (``total_units`` split evenly over nodes).
Each power-iteration round moves ``(units · damping_pct // 100) // outdeg``
units along every out-edge and adds a uniform base of
``(total_units · (100 − damping_pct) // 100) // n_nodes``. Because every
step is integer floor arithmetic and integer addition is associative, the
result is BIT-IDENTICAL on any block layout, merge order or cluster size —
the float formulation differs in ulps between summation orders, which is
exactly what makes float PageRank un-oracle-able. Mass lost to flooring and
to dangling nodes is dropped by definition (engine and oracle agree).

Two execution modes over an ``edges`` Dataset of (src:int64, dst:int64):

- ``broadcast`` (node table fits comfortably in one actor): the rank and
  out-degree dicts ship once per actor per round via ``ray.put``; each
  round is one embarrassingly-parallel pass over the edge blocks emitting
  per-destination partial sums (O(distinct dst per block) rows), folded on
  the driver. Edges NEVER move after the initial distinct — the right
  shape while node count ≪ edge count (the common web case is the
  opposite, hence:)
- ``join`` (node table is itself distributed): degree/node state, ranks
  and every round stay Datasets END-TO-END — degree is one node-keyed
  exchange, each round hash-joins ranks onto the edge list (edges carry
  their out-degree from a degree-JOIN pre-pass, never a broadcast dict),
  a node-keyed repartition folds per-destination sums in-block, and a
  left-outer join against the degree Dataset re-adds base units to
  in-degree-0 nodes. Node count comes from ``Dataset.count()``. Nothing
  O(nodes) or O(edges) ever touches the driver in this mode
  (``pagerank_units_ds`` returns the ranks Dataset; the DataFrame wrapper
  gathers only for the small-query API).

A unit test pins both modes bit-identical on a planted graph.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

DEFAULT_TOTAL_UNITS = 10**12
BROADCAST_NODE_LIMIT = 2_000_000
# below this many edges the whole graph gathers once and iterates in numpy
# on the driver (each distributed round otherwise pays ~10 s of executor +
# actor-pool fixed cost for microseconds of integer math) — the same
# size-switch precedent as dedup_ops.CC_INMEM_PAIR_LIMIT; all three modes
# are pinned bit-identical in tests
INMEM_EDGE_LIMIT = 5_000_000


def _flip(ds):
    from ray.data.context import ShuffleStrategy

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds


def _unflip(ds):
    ds.context.shuffle_strategy = rd.DataContext.get_current().shuffle_strategy
    return ds


def distinct_edges(ds, num_partitions: int | None = None):
    """Globally-distinct (src, dst) pairs: a keyed repartition co-locates
    duplicates so per-block drop_duplicates is exact; kernels emit typed
    empties because empty hash partitions arrive schema-less."""

    from crawler_ray.sizing import exchange_width

    num_partitions = num_partitions or exchange_width()

    def block(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "src" not in b.columns:
            return pd.DataFrame({"src": pd.Series(dtype=np.int64),
                                 "dst": pd.Series(dtype=np.int64)})
        return b.drop_duplicates(["src", "dst"]).astype(
            {"src": np.int64, "dst": np.int64})

    out = (_flip(ds).repartition(num_partitions, keys=["src", "dst"])
           .map_batches(block, batch_format="pandas", batch_size=None)
           .materialize())
    from crawler_ray.blocks import drop_empty_blocks

    return drop_empty_blocks(_unflip(out))


def _degrees_ds(edges, num_partitions: int):
    """Degree table as a DATASET: one row per node (src ∪ dst), ``d`` = out
    degree (0 for dangling nodes). Per-block combiners emit O(distinct node
    per block) partial rows, then ONE node-keyed exchange folds them exactly
    in-block — the O(nodes) frame never exists on the driver."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b.groupby("src", as_index=False).size().rename(
            columns={"src": "node", "size": "d"})
        dst = pd.DataFrame({"node": b["dst"].unique()})
        dst["d"] = np.int64(0)
        return pd.concat([d, dst], ignore_index=True).astype(
            {"node": np.int64, "d": np.int64})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "node" not in b.columns:
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "d": pd.Series(dtype=np.int64)})
        out = b.groupby("node", as_index=False).agg(d=("d", "sum"))
        return out.astype({"node": np.int64, "d": np.int64})

    from crawler_ray.blocks import drop_empty_blocks

    deg = (_flip(edges.map_batches(partial, batch_format="pandas"))
           .repartition(num_partitions, keys=["node"])
           .map_batches(fold, batch_format="pandas", batch_size=None)
           .materialize())
    return drop_empty_blocks(_unflip(deg))


def pagerank_units(edges, n_iters: int = 10, total_units: int = DEFAULT_TOTAL_UNITS,
                   damping_pct: int = 85, mode: str = "auto",
                   num_partitions: int | None = None) -> pd.DataFrame:
    """PageRank over a distinct-edge Dataset; returns (node, rank_units)
    sorted by node. ``mode``: 'inmem' | 'broadcast' | 'join' | 'auto'
    (inmem below ``INMEM_EDGE_LIMIT`` edges, broadcast below
    ``BROADCAST_NODE_LIMIT`` nodes, else join). In join mode this wrapper's
    final ``to_pandas`` is the ONLY driver gather — use
    :func:`pagerank_units_ds` to keep ranks distributed."""
    out = pagerank_units_ds(edges, n_iters=n_iters, total_units=total_units,
                            damping_pct=damping_pct, mode=mode,
                            num_partitions=num_partitions)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    out["node"] = out["node"].astype(np.int64)
    out["rank_units"] = out["rank_units"].astype(np.int64)
    return out.sort_values("node").reset_index(drop=True)


def pagerank_units_ds(edges, n_iters: int = 10,
                      total_units: int = DEFAULT_TOTAL_UNITS,
                      damping_pct: int = 85, mode: str = "auto",
                      num_partitions: int | None = None):
    """Like :func:`pagerank_units` but join mode returns the rank table as a
    Dataset (nothing O(nodes) or O(edges) on the driver); the bounded
    inmem/broadcast modes return a DataFrame."""
    from crawler_ray.sizing import exchange_width

    num_partitions = num_partitions or exchange_width()
    deg_ds = _degrees_ds(edges, num_partitions)
    n = deg_ds.count()
    base = (total_units * (100 - damping_pct) // 100) // n
    r0 = total_units // n
    if mode == "auto":
        n_edges = edges.count()
        mode = ("inmem" if n_edges <= INMEM_EDGE_LIMIT
                else "broadcast" if n <= BROADCAST_NODE_LIMIT else "join")
    if mode == "inmem":
        # bounded by INMEM_EDGE_LIMIT: the graph itself fits on the driver
        deg = deg_ds.to_pandas().sort_values("node").reset_index(drop=True)
        return _pagerank_inmem(edges.to_pandas(), deg, n_iters, r0, base,
                               damping_pct)
    if mode == "broadcast":
        # bounded by BROADCAST_NODE_LIMIT: the node table fits in one actor
        deg = deg_ds.to_pandas().sort_values("node").reset_index(drop=True)
        return _pagerank_broadcast(edges, deg, n_iters, r0, base, damping_pct)
    if mode == "join":
        return _pagerank_join(edges, deg_ds, n_iters, r0, base, damping_pct,
                              num_partitions)
    raise ValueError(f"unknown mode {mode!r}")


def _pagerank_inmem(e: pd.DataFrame, deg: pd.DataFrame, n_iters: int, r0: int,
                    base: int, damping_pct: int) -> pd.DataFrame:
    """Driver-local vectorized iteration (small graphs): the identical
    integer semantics as the distributed modes — np.add.at int64 sums are
    associative, so the three paths are bit-equal by construction."""
    nodes = deg["node"].to_numpy(np.int64)
    idx = pd.Series(np.arange(len(nodes)), index=nodes)
    d = deg["d"].to_numpy(np.int64)
    si = e["src"].map(idx).to_numpy(np.int64)
    di = e["dst"].map(idx).to_numpy(np.int64)
    r = np.full(len(nodes), r0, np.int64)
    for _ in range(n_iters):
        share = (r[si] * damping_pct // 100) // d[si]
        contrib = np.zeros(len(nodes), np.int64)
        np.add.at(contrib, di, share)
        r = base + contrib
    return pd.DataFrame({"node": nodes, "rank_units": r})


def _pagerank_broadcast(edges, deg: pd.DataFrame, n_iters: int, r0: int,
                        base: int, damping_pct: int) -> pd.DataFrame:
    deg_ref = ray.put(dict(zip(deg["node"].tolist(), deg["d"].tolist())))
    ranks = dict.fromkeys(deg["node"].tolist(), r0)
    for _ in range(n_iters):
        ranks_ref = ray.put(ranks)

        class Contrib:
            def __init__(self):
                self.r = ray.get(ranks_ref)
                self.d = ray.get(deg_ref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                src = b["src"]
                share = ((src.map(self.r).to_numpy(np.int64) * damping_pct // 100)
                         // src.map(self.d).to_numpy(np.int64))
                return (pd.DataFrame({"dst": b["dst"].to_numpy(np.int64),
                                      "c": share})
                        .groupby("dst", as_index=False).agg(c=("c", "sum")))

        p = (edges.map_batches(Contrib, batch_format="pandas",
                               concurrency=(1, 8)).to_pandas())
        contrib = p.groupby("dst")["c"].sum() if len(p) else pd.Series(dtype=np.int64)
        ranks = {v: base + int(contrib.get(v, 0)) for v in ranks}
    return pd.DataFrame({"node": list(ranks), "rank_units": list(ranks.values())})


def _pagerank_join(edges, deg_ds, n_iters: int, r0: int,
                   base: int, damping_pct: int, num_partitions: int):
    """Fully distributed mode: degree, edge, rank and contribution state are
    ALL Datasets; every per-round step is a hash join or a node-keyed fold.
    Returns the rank Dataset — no ``.to_pandas()``/``ray.put(big)`` appears
    anywhere in this function (pinned by a unit that counts driver gathers).
    """
    # pre-pass: pin each edge's out-degree onto the edge row once, BY JOIN
    # (src == node; every src is present in deg with d ≥ 1 by construction)
    edges_d = (edges.join(deg_ds, join_type="inner",
                          num_partitions=num_partitions,
                          on=("src",), right_on=("node",))
               .map_batches(
                   lambda b: pd.DataFrame(
                       {"src": b["src"].to_numpy(np.int64),
                        "dst": b["dst"].to_numpy(np.int64),
                        "d": b["d"].to_numpy(np.int64)}),
                   batch_format="pandas")
               .materialize())
    from crawler_ray.blocks import drop_empty_blocks

    edges_d = drop_empty_blocks(edges_d)
    ranks = (deg_ds.map_batches(
        lambda b: pd.DataFrame({"node": b["node"].to_numpy(np.int64),
                                "u": np.full(len(b), r0, np.int64)}),
        batch_format="pandas").materialize())

    def fold_contrib(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "dst" not in b.columns:
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "c": pd.Series(dtype=np.int64)})
        out = b.groupby("dst", as_index=False).agg(c=("c", "sum"))
        return out.rename(columns={"dst": "node"}).astype(
            {"node": np.int64, "c": np.int64})

    for _ in range(n_iters):
        j = edges_d.join(ranks, join_type="inner", num_partitions=num_partitions,
                         on=("src",), right_on=("node",))
        shares = j.map_batches(
            lambda b: pd.DataFrame(
                {"dst": b["dst"].to_numpy(np.int64),
                 "c": (b["u"].to_numpy(np.int64) * damping_pct // 100)
                      // b["d"].to_numpy(np.int64)}),
            batch_format="pandas")
        contrib = (_flip(shares).repartition(num_partitions, keys=["dst"])
                   .map_batches(fold_contrib, batch_format="pandas",
                                batch_size=None).materialize())
        _unflip(contrib)
        nxt = (deg_ds.join(contrib, join_type="left_outer",
                           num_partitions=num_partitions, on=("node",))
               .map_batches(
                   lambda b: pd.DataFrame(
                       {"node": b["node"].to_numpy(np.int64),
                        "u": base + b["c"].fillna(0).to_numpy(np.int64)}),
                   batch_format="pandas"))
        ranks = nxt.materialize()
    return ranks.map_batches(
        lambda b: b.rename(columns={"u": "rank_units"})[["node", "rank_units"]],
        batch_format="pandas")


# ---------------------------------------------------------------------------
# Triangle counting (Suri & Vassilvitskii 2011 "Counting Triangles and the
# Curse of the Last Reducer" — public). Degree-ordered orientation bounds
# per-node wedge fan-out by the oriented out-degree (O(√m) on any graph),
# so a celebrity node never generates deg² wedges.
# ---------------------------------------------------------------------------

def triangle_stats(edges, num_partitions: int | None = None) -> pd.DataFrame:
    """Exact triangle statistics over a directed edge Dataset (symmetrized
    and canonicalized internally). Returns ONE row:
    (n_nodes, n_edges, n_wedges, n_triangles) — n_wedges is the undirected
    path-of-2 count Σ C(deg, 2), n_triangles counts each triangle once.

    Dataflow: canonical distinct a<b edges (one keyed exchange) → degree
    Dataset (one keyed exchange) → degree attach on both endpoints
    (broadcast dict below BROADCAST_NODE_LIMIT, else two hash joins) →
    per-src wedge expansion after a src-keyed exchange (vectorized offset
    arithmetic, no Python pair loops) → close-check by UNIONING tagged
    wedge and edge rows and counting matches per co-located (v, w) block —
    one exchange, no Dataset.join. Only scalar sums reach the driver."""
    from crawler_ray.blocks import drop_empty_blocks
    from crawler_ray.sizing import exchange_width

    W = num_partitions or exchange_width()

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        m = s != d
        return pd.DataFrame({"src": np.minimum(s[m], d[m]),
                             "dst": np.maximum(s[m], d[m])})

    und = distinct_edges(edges.map_batches(canon, batch_format="pandas"), W)
    n_edges = und.count()
    if n_edges == 0:
        return pd.DataFrame({"n_nodes": [np.int64(0)], "n_edges": [np.int64(0)],
                             "n_wedges": [np.int64(0)],
                             "n_triangles": [np.int64(0)]})

    def dpart(b: pd.DataFrame) -> pd.DataFrame:
        both = np.concatenate([b["src"].to_numpy(np.int64),
                               b["dst"].to_numpy(np.int64)])
        u, c = np.unique(both, return_counts=True)
        return pd.DataFrame({"node": u.astype(np.int64),
                             "d": c.astype(np.int64)})

    def dfold(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "node" not in b.columns:
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "d": pd.Series(dtype=np.int64)})
        return (b.groupby("node", as_index=False).agg(d=("d", "sum"))
                .astype({"node": np.int64, "d": np.int64}))

    deg = (_flip(und.map_batches(dpart, batch_format="pandas"))
           .repartition(W, keys=["node"])
           .map_batches(dfold, batch_format="pandas", batch_size=None)
           .materialize())
    deg = drop_empty_blocks(_unflip(deg))
    n_nodes = deg.count()
    n_wedges = int(deg.map_batches(
        lambda b: pd.DataFrame({"w": np.array(
            [(b["d"].to_numpy(np.int64) * (b["d"].to_numpy(np.int64) - 1) // 2).sum()],
            np.int64)}), batch_format="pandas").sum("w"))

    # degree attach on both endpoints, then orient u→v iff (d_u,u)<(d_v,v)
    if n_nodes <= BROADCAST_NODE_LIMIT:
        dd = deg.to_pandas()
        dref = ray.put(dict(zip(dd["node"].astype(int), dd["d"].astype(int))))

        class Attach:
            def __init__(self):
                self.m = ray.get(dref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                out = b.copy()
                out["d_src"] = b["src"].map(self.m).astype(np.int64)
                out["d_dst"] = b["dst"].map(self.m).astype(np.int64)
                return out

        att = und.map_batches(Attach, batch_format="pandas",
                              concurrency=(1, 8))
    else:
        ds1 = und.join(deg.map_batches(
            lambda b: b.rename(columns={"node": "src", "d": "d_src"}),
            batch_format="pandas"), join_type="inner",
            num_partitions=W, on=("src",))
        att = ds1.join(deg.map_batches(
            lambda b: b.rename(columns={"node": "dst", "d": "d_dst"}),
            batch_format="pandas"), join_type="inner",
            num_partitions=W, on=("dst",))

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "src" not in b.columns:
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in ("u", "v", "d_v")})
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        ds_ = b["d_src"].to_numpy(np.int64)
        dd_ = b["d_dst"].to_numpy(np.int64)
        fwd = (ds_ < dd_) | ((ds_ == dd_) & (s < d))
        return pd.DataFrame({
            "u": np.where(fwd, s, d), "v": np.where(fwd, d, s),
            "d_v": np.where(fwd, dd_, ds_)}).astype(np.int64)

    oriented = (_flip(att.map_batches(orient, batch_format="pandas"))
                .repartition(W, keys=["u"])
                .materialize())
    oriented = drop_empty_blocks(_unflip(oriented))

    def wedges(b: pd.DataFrame) -> pd.DataFrame:
        e = pd.DataFrame({c: pd.Series(dtype=np.int64) for c in ("v", "w", "t")})
        if len(b) == 0 or "u" not in b.columns:
            return e
        # neighbors of each u sorted by orientation order (d, id): ordered
        # pairs (v before w) are exactly the wedges whose closing edge, if
        # present, is oriented v→w
        b = b.sort_values(["u", "d_v", "v"], kind="mergesort")
        u = b["u"].to_numpy(np.int64)
        v = b["v"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        sizes = np.diff(np.r_[starts, len(u)])
        if not (sizes > 1).any():
            return e
        # fully vectorized ordered-pair expansion: element i (local index
        # j in its group) is the RIGHT of j pairs whose lefts are the j
        # group members before it — no per-group Python loop
        grp_start = np.repeat(starts, sizes)          # per element
        loc = np.arange(len(u)) - grp_start           # local index = j
        right_idx = np.repeat(np.arange(len(u)), loc)
        csum = np.concatenate([[0], np.cumsum(loc)[:-1]])
        within = np.arange(int(loc.sum())) - np.repeat(csum, loc)
        left_idx = np.repeat(grp_start, loc) + within
        return pd.DataFrame({"v": v[left_idx], "w": v[right_idx]}).assign(
            t=np.int64(0)).astype(np.int64)

    wedge_ds = oriented.map_batches(wedges, batch_format="pandas",
                                    batch_size=None)
    edge_tagged = oriented.map_batches(
        lambda b: (pd.DataFrame({"v": b["u"].to_numpy(np.int64),
                                 "w": b["v"].to_numpy(np.int64),
                                 "t": np.ones(len(b), np.int64)})
                   if len(b) and "u" in b.columns else
                   pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in ("v", "w", "t")})),
        batch_format="pandas")

    def close_count(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "v" not in b.columns:
            return pd.DataFrame({"n": pd.Series(dtype=np.int64)})
        is_edge = b["t"].to_numpy(np.int64) == 1
        key = pd.MultiIndex.from_arrays([b["v"], b["w"]])
        closed = pd.Index(key[is_edge])
        n = int(pd.Index(key[~is_edge]).isin(closed).sum())
        return pd.DataFrame({"n": np.array([n], np.int64)})

    both = (_flip(wedge_ds.union(edge_tagged))
            .repartition(W, keys=["v", "w"])
            .map_batches(close_count, batch_format="pandas", batch_size=None)
            .materialize())
    both = drop_empty_blocks(_unflip(both))
    n_tri = int(both.sum("n") or 0)
    return pd.DataFrame({"n_nodes": [np.int64(n_nodes)],
                         "n_edges": [np.int64(n_edges)],
                         "n_wedges": [np.int64(n_wedges)],
                         "n_triangles": [np.int64(n_tri)]})
