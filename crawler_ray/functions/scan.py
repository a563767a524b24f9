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


def sessionize_ds(ds, group_col: str, ts_col: str, id_col: str, gap: int,
                  out_col: str = "session_id"):
    """Gap-based sessionization: assign each event a per-group session
    number, where a new session starts at the group's first event or when
    the time since the group's PREVIOUS event exceeds ``gap`` (strictly
    greater; equal-to-gap stays in the session). The classic event-stream
    operator (web analytics "30-minute inactivity" rule).

    ``ts_col`` must be int64 (convert timestamps to epoch µs upstream so
    the arithmetic is exact); ``gap`` is in the same units.
    ``(group_col, ts_col, id_col)`` must be a unique key (same carry-keying
    rule as the scans above; ``id_col`` is the tiebreaker).

    Distributed shape — identical economics to
    :func:`grouped_cumulative_sum_ds`: one sort exchange co-locates each
    group into contiguous block ranges; every in-block new-session flag is
    computable locally (vectorized diff), and ONLY each block's first-row
    flag depends on its predecessor block. Pass 1 emits one summary row
    per block (first/last group, first/last timestamp, in-block start
    counts for the first and last group); the driver threads
    (prev_group, prev_ts, running session count) through the O(blocks)
    summaries and hands each block (boundary_flag, carry_in_sessions).
    Pass 2 is one vectorized per-group cumsum of the flag vector. Driver
    memory is O(blocks) at any group/event cardinality; session ids are
    identical under any block layout.
    """
    sort_cols = [group_col, ts_col, id_col]
    s = ds.sort(sort_cols).materialize()

    def flags_excl0(u: np.ndarray, t: np.ndarray) -> np.ndarray:
        """New-session flags with the boundary-dependent row 0 left at 0."""
        f = np.zeros(len(u), np.int64)
        if len(u) > 1:
            f[1:] = ((u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > gap)).astype(np.int64)
        return f

    def block_summary(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            cols = {c: b[c].iloc[:0].reset_index(drop=True) for c in sort_cols}
            cols["_first_grp"] = b[group_col].iloc[:0].reset_index(drop=True)
            cols["_last_grp"] = b[group_col].iloc[:0].reset_index(drop=True)
            for extra in ("_first_ts", "_last_ts", "_starts_first", "_starts_last"):
                cols[extra] = pd.Series([], dtype=np.int64)
            return pd.DataFrame(cols)
        u = b[group_col].to_numpy()
        t = b[ts_col].to_numpy(np.int64)
        f = flags_excl0(u, t)
        cols = {c: [b[c].iloc[0]] for c in sort_cols}
        cols["_first_grp"] = [u[0]]
        cols["_last_grp"] = [u[-1]]
        cols["_first_ts"] = [np.int64(t[0])]
        cols["_last_ts"] = [np.int64(t[-1])]
        # starts among the first/last group's rows, row 0 excluded — the
        # last-group segment's leading row (a group change) IS counted
        cols["_starts_first"] = [np.int64(f[u == u[0]].sum())]
        cols["_starts_last"] = [np.int64(f[u == u[-1]].sum())]
        return pd.DataFrame(cols)

    summaries = (s.map_batches(block_summary, batch_format="pandas",
                               batch_size=None).to_pandas()
                 .sort_values(sort_cols, kind="mergesort"))
    carry: dict[tuple, tuple] = {}
    prev_grp, prev_ts, run_sessions = None, None, 0
    for d in summaries.to_dict("records"):
        key = tuple(d[c] for c in sort_cols)
        if prev_grp is None or prev_grp != d["_first_grp"]:
            boundary, carry_in = 1, 0  # group's first event overall
        else:
            boundary = 1 if (d["_first_ts"] - prev_ts) > gap else 0
            carry_in = run_sessions
        carry[key] = (int(boundary), int(carry_in))
        if d["_first_grp"] == d["_last_grp"]:
            # single-group block: extend (or start) the open chain
            run_sessions = carry_in + boundary + int(d["_starts_first"])
        else:
            # last group began inside this block; its leading group-change
            # flag is inside _starts_last
            run_sessions = int(d["_starts_last"])
        prev_grp, prev_ts = d["_last_grp"], d["_last_ts"]

    def apply_sessions(b: pd.DataFrame, *, carry: dict) -> pd.DataFrame:
        b = b.copy()
        if len(b) == 0:
            b[out_col] = pd.Series([], dtype=np.int64)
            return b
        u = b[group_col].to_numpy()
        t = b[ts_col].to_numpy(np.int64)
        boundary, carry_in = carry[tuple(b[c].iloc[0] for c in sort_cols)]
        f = flags_excl0(u, t)
        f[0] = boundary
        sess = pd.Series(f).groupby(u).cumsum().to_numpy()
        sess = sess + np.where(u == u[0], np.int64(carry_in), np.int64(0))
        b[out_col] = sess.astype(np.int64)
        return b

    return s.map_batches(apply_sessions, batch_format="pandas",
                         batch_size=None, fn_kwargs={"carry": carry})


NEG_INF_I64 = np.iinfo(np.int64).min


def grouped_cumulative_max_ds(ds, group_col: str, order_cols: list[str],
                              value_col: str, out_col: str = "prev_max"):
    """``MAX(value) OVER (PARTITION BY group ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` — the EXCLUSIVE grouped running
    maximum, i.e. the per-stream WATERMARK each event is compared against
    in late-arrival accounting. int64 values only; rows with no
    predecessor get ``NEG_INF_I64``.

    Same O(blocks) carry discipline as :func:`grouped_cumulative_sum_ds`:
    the sort co-locates groups, each block emits (first-group max,
    last-group max), the driver threads a running max through same-group
    block chains, and pass 2 is one vectorized in-block grouped cummax
    shifted by a row."""
    sort_cols = [group_col] + list(order_cols)
    s = ds.sort(sort_cols).materialize()

    def block_summary(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            cols = {c: b[c].iloc[:0].reset_index(drop=True) for c in sort_cols}
            cols["_first_grp"] = b[group_col].iloc[:0].reset_index(drop=True)
            cols["_last_grp"] = b[group_col].iloc[:0].reset_index(drop=True)
            cols["_first_max"] = pd.Series([], dtype=np.int64)
            cols["_last_max"] = pd.Series([], dtype=np.int64)
            return pd.DataFrame(cols)
        g = b[group_col].to_numpy()
        v = b[value_col].to_numpy(np.int64)
        cols = {c: [b[c].iloc[0]] for c in sort_cols}
        cols["_first_grp"] = [g[0]]
        cols["_last_grp"] = [g[-1]]
        cols["_first_max"] = [np.int64(v[g == g[0]].max())]
        cols["_last_max"] = [np.int64(v[g == g[-1]].max())]
        return pd.DataFrame(cols)

    summaries = (s.map_batches(block_summary, batch_format="pandas",
                               batch_size=None).to_pandas()
                 .sort_values(sort_cols, kind="mergesort"))
    carry: dict[tuple, int] = {}
    run_grp, run_max = None, NEG_INF_I64
    for d in summaries.to_dict("records"):
        key = tuple(d[c] for c in sort_cols)
        same = run_grp is not None and run_grp == d["_first_grp"]
        carry[key] = int(run_max) if same else NEG_INF_I64
        if d["_first_grp"] == d["_last_grp"]:
            base = carry[key]
            run_grp, run_max = d["_last_grp"], max(base, int(d["_last_max"]))
        else:
            run_grp, run_max = d["_last_grp"], int(d["_last_max"])

    def apply_scan(b: pd.DataFrame, *, carry: dict) -> pd.DataFrame:
        b = b.copy()
        if len(b) == 0:
            b[out_col] = pd.Series([], dtype=np.int64)
            return b
        key = tuple(b[c].iloc[0] for c in sort_cols)
        g = b[group_col].to_numpy()
        v = b[value_col].to_numpy(np.int64)
        cm = pd.Series(v).groupby(g).cummax().to_numpy(np.int64)
        base = np.concatenate([[NEG_INF_I64], cm[:-1]])
        first_of_group = np.r_[True, g[1:] != g[:-1]]
        base[first_of_group] = NEG_INF_I64
        in_first = g == g[0]
        c0 = carry[key]
        b[out_col] = np.where(in_first, np.maximum(base, c0), base).astype(np.int64)
        return b

    return s.map_batches(apply_scan, batch_format="pandas", batch_size=None,
                         fn_kwargs={"carry": carry})


def grouped_lag_ds(ds, group_col: str, order_cols: list[str], value_col: str,
                   out_col: str = "prev_value"):
    """``LAG(value) OVER (PARTITION BY group ORDER BY order_cols)`` — the
    window NAVIGATION function (previous row's value within the group).

    Same distributed economics as :func:`grouped_cumulative_sum_ds`: one
    sort exchange co-locates each group into contiguous block ranges; every
    in-block lag is a vectorized ``shift``, and ONLY each block's first row
    depends on its predecessor block — pass 1 emits one summary row per
    block (first-row key, last row's group and value), the driver threads
    the O(blocks) chain in order, and pass 2 hands each block the carry
    (its first row's lag, or None when the first row starts its group).
    Rows with no predecessor carry NaN (callers filter them, matching SQL's
    ``WHERE prev IS NOT NULL``). Driver memory O(blocks).

    ``(group_col, *order_cols)`` must be a unique key (carry keying).
    """
    sort_cols = [group_col] + list(order_cols)
    s = ds.sort(sort_cols).materialize()

    def block_summary(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            cols = {c: b[c].iloc[:0].reset_index(drop=True) for c in sort_cols}
            cols["_last_grp"] = b[group_col].iloc[:0].reset_index(drop=True)
            cols["_last_val"] = b[value_col].iloc[:0].reset_index(drop=True)
            return pd.DataFrame(cols)
        cols = {c: [b[c].iloc[0]] for c in sort_cols}
        cols["_last_grp"] = [b[group_col].iloc[-1]]
        cols["_last_val"] = [b[value_col].iloc[-1]]
        return pd.DataFrame(cols)

    summaries = (s.map_batches(block_summary, batch_format="pandas",
                               batch_size=None).to_pandas()
                 .sort_values(sort_cols, kind="mergesort"))
    carry: dict[tuple, object] = {}
    prev_grp, prev_val = None, None
    for d in summaries.to_dict("records"):
        key = tuple(d[c] for c in sort_cols)
        carry[key] = (prev_val if prev_grp is not None
                      and prev_grp == d[group_col] else None)
        prev_grp, prev_val = d["_last_grp"], d["_last_val"]

    def apply_lag(b: pd.DataFrame, *, carry: dict) -> pd.DataFrame:
        b = b.copy()
        numeric = b[value_col].dtype.kind in "fiu"
        if len(b) == 0:
            b[out_col] = pd.Series(
                [], dtype=np.float64 if numeric else object)
            return b
        key = tuple(b[c].iloc[0] for c in sort_cols)
        g = b[group_col].to_numpy()
        first_of_group = np.r_[True, g[1:] != g[:-1]]
        c0 = carry[key]
        if numeric:
            # numeric path: float64 shift, NaN where no predecessor
            v = b[value_col].to_numpy(np.float64)
            prev = np.concatenate([[np.nan], v[:-1]])
            prev[first_of_group] = np.nan
            if c0 is not None:
                prev[0] = np.float64(c0)
        else:
            # object path (strings etc.): None where no predecessor
            v = b[value_col].to_numpy(object)
            prev = np.concatenate([[None], v[:-1]])
            prev[first_of_group] = None
            if c0 is not None:
                prev[0] = c0
        b[out_col] = prev
        return b

    return s.map_batches(apply_lag, batch_format="pandas", batch_size=None,
                         fn_kwargs={"carry": carry})
