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
