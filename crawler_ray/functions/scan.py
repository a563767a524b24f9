"""Distributed analytic (window) scans over a global total order.

Ray Data has no running/cumulative aggregate ("SUM(...) OVER (ORDER BY ...)"
analytic), yet training-data pipelines need one constantly: running corpus
token totals, greedy sequence packing into fixed token-budget shards,
running byte offsets for concatenated exports. This module implements the
classic two-pass parallel prefix-sum (Blelloch scan) on Dataset blocks:

1. ``sort(order_cols)`` — one all-to-all exchange establishes the global
   order and co-locates contiguous ranges into blocks.
2. Pass 1 (parallel): each block emits ONE summary row — its first-row
   order key and its value sum. The driver gathers O(num_blocks) rows,
   orders them by first key, and takes an exclusive prefix sum: the
   carry-in offset of every block.
3. Pass 2 (parallel): each block looks up its carry-in by its own
   first-row key (a tiny dict shipped per task) and adds an in-block
   vectorized ``cumsum``. The result streams out as a lazy Dataset.

Driver memory is O(blocks); worker memory is O(block). No per-row data
ever crosses the driver, so the same code runs at 10^9+ rows where the
single-node window operator stops being an option.

Partitioning assumption (documented per the build brief): ``order_cols``
must form a UNIQUE key — the per-block carry is keyed on each block's
first-row order tuple, so duplicate first-row keys across blocks would
collide. Append a tiebreaker id column (every call site here does).

The reference has no analytic operator; this backs the training-data
extension queries (``running_revenue``, ``token_shard_assignment``).
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def _first_key(b: pd.DataFrame, order_cols: list[str]) -> tuple:
    return tuple(b[c].iloc[0] for c in order_cols)


def cumulative_sum_ds(ds, order_cols: list[str], value_col: str,
                      out_col: str = "running_sum", exclusive: bool = False):
    """Running sum of ``value_col`` over the global ``order_cols`` order.

    Returns a LAZY Dataset = the sorted input plus ``out_col``. With
    ``exclusive=True`` each row gets the sum of strictly-preceding rows
    (0 for the global first row) — the form sequence packing needs.
    Integer inputs stay int64 end-to-end (exact); floats stay float64.
    """
    s = ds.sort(order_cols).materialize()

    def block_summary(b: pd.DataFrame) -> pd.DataFrame:
        sum_dtype = np.float64 if b[value_col].dtype.kind == "f" else np.int64
        if len(b) == 0:
            cols = {c: b[c].iloc[:0].reset_index(drop=True) for c in order_cols}
            cols["_block_sum"] = pd.Series([], dtype=sum_dtype)
            return pd.DataFrame(cols)
        cols = {c: [b[c].iloc[0]] for c in order_cols}
        cols["_block_sum"] = [sum_dtype(b[value_col].to_numpy().sum())]
        return pd.DataFrame(cols)

    summaries = s.map_batches(block_summary, batch_format="pandas",
                              batch_size=None).to_pandas()
    if len(summaries) == 0:
        # fully-empty input collects as a 0-row (possibly no-column) frame;
        # every downstream block is empty too, so no carry is needed
        carry: dict = {}
    else:
        summaries = summaries.sort_values(order_cols, kind="mergesort")
        sums = summaries["_block_sum"].to_numpy()
        offsets = np.concatenate([[sums.dtype.type(0)], np.cumsum(sums)[:-1]])
        carry = {tuple(row): off for row, off in
                 zip(summaries[order_cols].itertuples(index=False, name=None),
                     offsets)}

    def apply_scan(b: pd.DataFrame, *, carry: dict) -> pd.DataFrame:
        b = b.copy()
        if len(b) == 0:
            b[out_col] = pd.Series([], dtype=np.int64)
            return b
        v = b[value_col].to_numpy()
        run = carry[_first_key(b, order_cols)] + np.cumsum(v)
        b[out_col] = (run - v) if exclusive else run
        return b

    return s.map_batches(apply_scan, batch_format="pandas", batch_size=None,
                         fn_kwargs={"carry": carry})


def grouped_cumulative_sum_ds(ds, group_col: str, order_cols: list[str],
                              value_col: str, out_col: str = "running_sum",
                              exclusive: bool = False):
    """``SUM(value) OVER (PARTITION BY group ORDER BY order_cols)`` —
    the partitioned analytic scan.

    Sorting by (group, *order_cols) co-locates each group into contiguous
    block ranges, so a group's running sum only needs cross-block carry
    when the group STRADDLES a block boundary — at most one group per
    boundary. Pass 1 therefore emits just TWO partial sums per block (its
    first and last group); the driver walks the O(blocks) summaries in
    order, threading a running total through chains of blocks that share a
    straddling group, and hands each block the carry-in of its first
    group. Pass 2 is one vectorized in-block ``groupby(...).cumsum()``
    plus the carry added to the leading group's rows. Driver memory stays
    O(blocks) at any group cardinality — the per-group running state that
    a naive implementation would centralize never exists anywhere.

    ``(group_col, *order_cols)`` must be a unique key (same reason as
    :func:`cumulative_sum_ds`).
    """
    sort_cols = [group_col] + list(order_cols)
    s = ds.sort(sort_cols).materialize()

    def block_summary(b: pd.DataFrame) -> pd.DataFrame:
        sum_dtype = np.float64 if b[value_col].dtype.kind == "f" else np.int64
        if len(b) == 0:
            cols = {c: b[c].iloc[:0].reset_index(drop=True) for c in sort_cols}
            for extra in ("_first_grp", "_last_grp"):
                cols[extra] = b[group_col].iloc[:0].reset_index(drop=True)
            cols["_first_sum"] = pd.Series([], dtype=sum_dtype)
            cols["_last_sum"] = pd.Series([], dtype=sum_dtype)
            return pd.DataFrame(cols)
        g = b[group_col].to_numpy()
        v = b[value_col].to_numpy()
        first_mask = g == g[0]
        last_mask = g == g[-1]
        cols = {c: [b[c].iloc[0]] for c in sort_cols}
        cols["_first_grp"] = [g[0]]
        cols["_last_grp"] = [g[-1]]
        cols["_first_sum"] = [sum_dtype(v[first_mask].sum())]
        cols["_last_sum"] = [sum_dtype(v[last_mask].sum())]
        return pd.DataFrame(cols)

    summaries = (s.map_batches(block_summary, batch_format="pandas",
                               batch_size=None).to_pandas()
                 .sort_values(sort_cols, kind="mergesort"))
    carry: dict[tuple, object] = {}
    run_grp, run_total = None, None
    for d in summaries.to_dict("records"):
        key = tuple(d[c] for c in sort_cols)
        # pandas normalizes scalar equality across numpy types
        carry[key] = d["_first_sum"] * 0 if (run_grp is None or run_grp != d["_first_grp"]) else run_total
        if d["_first_grp"] == d["_last_grp"]:
            # single-group block: extend (or start) the open chain
            base = carry[key]
            run_grp, run_total = d["_last_grp"], base + d["_last_sum"]
        else:
            run_grp, run_total = d["_last_grp"], d["_last_sum"]

    def apply_scan(b: pd.DataFrame, *, carry: dict) -> pd.DataFrame:
        b = b.copy()
        if len(b) == 0:
            b[out_col] = pd.Series([], dtype=np.int64)
            return b
        key = tuple(b[c].iloc[0] for c in sort_cols)
        g = b[group_col]
        v = b[value_col]
        run = v.groupby(g.to_numpy()).cumsum().to_numpy()
        run = run + np.where(g.to_numpy() == g.iloc[0], carry[key], v.to_numpy() * 0)
        b[out_col] = (run - v.to_numpy()) if exclusive else run
        return b

    return s.map_batches(apply_scan, batch_format="pandas", batch_size=None,
                         fn_kwargs={"carry": carry})
