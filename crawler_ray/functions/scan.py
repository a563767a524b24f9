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
