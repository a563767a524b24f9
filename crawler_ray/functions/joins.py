"""Reusable distributed join operators Ray Data lacks natively.

``asof_join`` — big⋈big point-in-time join: for every left row, the value
of the latest right row with the same key at or before the left row's
time (inclusive). No native Ray Data support; the distributed formulation
is ONE global sort shuffle on (key, time, side) followed by a per-block
vectorized group-aware forward fill:

- both sides are tagged and unioned; rights sort before lefts at equal
  (key, time), which is what makes the match inclusive;
- equal-(key, time) right rows combine deterministically (max value), so
  ties never depend on block layout;
- a block resolves every left row whose key has an in-block predecessor.
  A leading left row can have its predecessor in an EARLIER block only if
  its key straddles the block boundary — i.e. it is the block's first key
  — so at most one key's rows per block go to the driver unresolved;
- each block also emits its last right row per key (O(distinct keys)
  state, result-scale), and the driver re-runs the identical fold once
  over that small remainder.

Cost: one sort shuffle of |L|+|R| rows; resolved lefts stream out of the
fold as a lazy Dataset (``asof_join_ds``) and the driver holds only the
seam remainder — O(straddling key + distinct-key states), never O(|L|)
or O(result). When the right side is small, a broadcast + per-batch
``merge_asof`` is cheaper; this path requires neither side to fit
anywhere.

``interval_join_bins`` — range-predicate join via bin replication: each
right-side interval replicates into every fixed-width bin it overlaps,
each left row maps to exactly ONE bin, and a hash equality join + a
vectorized residual filter meets every qualifying pair exactly once (no
dedup pass). Exposed as a helper that returns the joined pair dataset;
see queries.events_in_windows for the full rollup composition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_R, _E = np.int8(0), np.int8(1)  # right/left tags; rights first at ties
_COLS = ["k", "t", "side", "left_id", "val"]


def _empty_fold_frame() -> pd.DataFrame:
    return pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                         "t": pd.Series([], dtype=np.int64),
                         "side": pd.Series([], dtype=np.int8),
                         "left_id": pd.Series([], dtype=np.int64),
                         "val": pd.Series([], dtype=np.float64),
                         "u": pd.Series([], dtype=np.int8)})


def _asof_fold(df: pd.DataFrame, final: bool = False) -> pd.DataFrame:
    """Per-block forward fill + seam bookkeeping (see module docstring)."""
    if len(df) == 0:
        return _empty_fold_frame()
    df = df.sort_values(["k", "t", "side"], kind="mergesort").reset_index(drop=True)
    isr = df["side"].to_numpy() == _R
    r = df.loc[isr].groupby(["k", "t"], as_index=False)["val"].max()
    r["side"], r["left_id"] = _R, np.int64(-1)
    c = (pd.concat([r[_COLS], df.loc[~isr, _COLS]], ignore_index=True)
         .sort_values(["k", "t", "side"], kind="mergesort").reset_index(drop=True))
    v = np.where(c["side"].to_numpy() == _R, c["val"].to_numpy(), np.nan)
    kvals = c["k"].to_numpy()
    filled = pd.Series(v).groupby(kvals).ffill().to_numpy()
    # fill-source time: which right instant each left actually filled from
    # (nullable Int64 keeps the comparison exact for full-range timestamps)
    _ts = pd.Series(c["t"].to_numpy(), dtype="Int64")
    _ts[c["side"].to_numpy() != _R] = pd.NA
    tsrc = _ts.groupby(kvals).ffill()
    isl = c["side"].to_numpy() == _E
    lefts = c.loc[isl].copy()
    lefts["val"] = filled[isl]
    if final:
        lefts["u"] = np.int8(0)
    else:
        unresolved = np.isnan(lefts["val"].to_numpy()) & (lefts["k"].to_numpy() == c["k"].iloc[0])
        # tie-run straddle: if this block STARTS with a right row, rows of
        # that same (k, t) may continue from the previous block, so its
        # in-block (k,t)-max is only partial — every left that filled from
        # exactly that instant must be re-resolved at the driver, where the
        # head-state rows from all run pieces meet (groupby max).
        if bool(c["side"].iloc[0] == _R):
            k0, t0 = c["k"].iloc[0], c["t"].iloc[0]
            unresolved |= ((lefts["k"].to_numpy() == k0)
                           & (tsrc[isl] == int(t0)).fillna(False).to_numpy())
        lefts["u"] = np.where(unresolved, 1, 0).astype(np.int8)
    rights = c.loc[~isl]
    states = rights.groupby("k", as_index=False)[["t", "val"]].last()
    if not final and len(rights) and bool(c["side"].iloc[0] == _R):
        # head-state: the (possibly partial) reduced leading run, so the
        # driver can merge it with the previous block's tail piece
        states = pd.concat([states, rights.iloc[[0]][["k", "t", "val"]]],
                           ignore_index=True)
    states["side"], states["left_id"], states["u"] = _R, np.int64(-1), np.int8(0)
    return pd.concat([states[_COLS + ["u"]], lefts[_COLS + ["u"]]], ignore_index=True)


def asof_join_ds(left_ds, right_ds, *, left_id: str, key: str, time: str,
                 right_key: str, right_time: str, right_value: str):
    """As-of join two Datasets; returns a LAZY Dataset of
    (left_id, key, value) with NaN value where a left row precedes every
    right row of its key. Int64 keys/ids, int64 time, float64 value.
    Right-side (key, time) ties resolve to the MAX value.

    Resolved left rows stream out of the per-block fold without ever
    visiting the driver; the driver gathers ONLY the seam remainder —
    per-key right states (O(distinct keys) per block, combined at (k,t))
    plus the lefts of each block's boundary-straddling first key — folds
    it once, and unions the (seam-sized) resolved stragglers back into
    the output stream. Driver memory is O(seam), not O(result)."""
    import ray.data as rd

    def tag_left(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b[key].to_numpy(np.int64),
                             "t": b[time].to_numpy(np.int64),
                             "side": _E,
                             "left_id": b[left_id].to_numpy(np.int64),
                             "val": np.nan})

    def tag_right(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"k": b[right_key].to_numpy(np.int64),
                           "t": b[right_time].to_numpy(np.int64),
                           "side": _R, "left_id": np.int64(-1),
                           "val": b[right_value].to_numpy(np.float64)})
        # per-batch combine of equal (k,t) rights — shrinks the shuffle
        return df.groupby(["k", "t", "side", "left_id"], as_index=False)["val"].max()[_COLS]

    def out_frame(done: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({left_id: done["left_id"].to_numpy(np.int64),
                             key: done["k"].to_numpy(np.int64),
                             right_value: done["val"].to_numpy(np.float64)})

    def emit_resolved(b: pd.DataFrame) -> pd.DataFrame:
        keep = b.loc[(b["side"].to_numpy() == _E) & (b["u"].to_numpy() == 0)]
        return out_frame(keep)

    def seam_only(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[(b["side"].to_numpy() != _E) | (b["u"].to_numpy() == 1)]

    tagged = (left_ds.map_batches(tag_left, batch_format="pandas")
              .union(right_ds.map_batches(tag_right, batch_format="pandas")))
    # materialized ONCE: both the streamed-output pass and the seam gather
    # read the same folded blocks (re-planning would re-run the sort)
    folded_ds = (tagged.sort(["k", "t", "side"])
                 .map_batches(_asof_fold, batch_format="pandas", batch_size=None)
                 .materialize())
    seam_pd = (folded_ds.map_batches(seam_only, batch_format="pandas",
                                     batch_size=None).to_pandas())
    out_ds = folded_ds.map_batches(emit_resolved, batch_format="pandas",
                                   batch_size=None)
    if len(seam_pd) == 0:
        return out_ds
    seam = _asof_fold(seam_pd[_COLS], final=True)
    seam_lefts = out_frame(seam.loc[seam["side"].to_numpy() == _E])
    if len(seam_lefts) == 0:
        return out_ds
    return out_ds.union(rd.from_pandas(seam_lefts))


def asof_join(left_ds, right_ds, *, left_id: str, key: str, time: str,
              right_key: str, right_time: str, right_value: str) -> pd.DataFrame:
    """Result-scale convenience wrapper over ``asof_join_ds`` — gathers the
    lazy output to one DataFrame. Callers whose left side does not fit on
    the driver must consume ``asof_join_ds`` directly (write/iterate)."""
    return asof_join_ds(left_ds, right_ds, left_id=left_id, key=key, time=time,
                        right_key=right_key, right_time=right_time,
                        right_value=right_value).to_pandas()


class AsofBroadcastLookup:
    """Actor-pool `map_batches` callable for the SMALL-right-side as-of
    join: the (key, time)-max-reduced right table ships once per actor via
    ``ray.put`` (never per batch), and each batch resolves with one
    C-implemented ``pd.merge_asof`` (backward, inclusive) — the cheaper
    shape whenever the right side fits in a worker heap. Semantics are
    identical to ``asof_join`` (same max tie rule), tested equivalent."""

    def __init__(self, right_ref, *, right_key: str, right_time: str, right_value: str):
        import ray

        r = ray.get(right_ref) if not isinstance(right_ref, pd.DataFrame) else right_ref
        r = (r.groupby([right_key, right_time], as_index=False)[right_value].max()
             .sort_values(right_time, kind="mergesort").reset_index(drop=True))
        self.right = r
        self.rk, self.rt, self.rv = right_key, right_time, right_value

    def __call__(self, batch: pd.DataFrame, *, key: str, time: str) -> pd.DataFrame:
        if self.rv in batch.columns:
            raise ValueError(
                f"asof right_value column {self.rv!r} already exists on the left side")
        if len(batch) == 0:
            out = batch.copy()
            out[self.rv] = pd.Series([], dtype=np.float64)
            return out
        order = np.argsort(batch[time].to_numpy(), kind="stable")
        b = batch.iloc[order]
        joined = pd.merge_asof(b, self.right, left_on=time, right_on=self.rt,
                               left_by=key, right_by=self.rk,
                               direction="backward", allow_exact_matches=True)
        joined = joined.iloc[np.argsort(order, kind="stable")].reset_index(drop=True)
        # drop BOTH right-side helper columns: the right time always, and the
        # right key when it isn't the shared join key (it would otherwise
        # leak into the output schema)
        drop = {self.rt} | ({self.rk} - {key})
        return joined.drop(columns=[c for c in drop if c in joined.columns])


def asof_join_broadcast(left_ds, right_df: pd.DataFrame, *, key: str, time: str,
                        right_key: str, right_time: str, right_value: str):
    """Streaming small-side as-of join: returns a lazy Dataset (left rows +
    the as-of value column), unlike the big⋈big `asof_join` which must
    gather its result. Right side is broadcast once (`ray.put`)."""
    import ray

    ref = ray.put(right_df)
    return left_ds.map_batches(
        AsofBroadcastLookup,
        fn_constructor_kwargs=dict(right_ref=ref, right_key=right_key,
                                   right_time=right_time, right_value=right_value),
        fn_kwargs=dict(key=key, time=time),
        batch_format="pandas", concurrency=(1, 8))


def replicate_intervals(b: pd.DataFrame, *, start: str, end: str,
                        bin_width: int, bin_col: str = "wbin") -> pd.DataFrame:
    """Interval-join helper: one output row per (interval, overlapped bin),
    fully vectorized (repeat + cumsum offsets)."""
    lo = b[start].to_numpy(np.int64) // bin_width
    hi = b[end].to_numpy(np.int64) // bin_width
    reps = (hi - lo + 1).astype(np.int64)
    idx = np.repeat(np.arange(len(b)), reps)
    off = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
    out = b.iloc[idx].reset_index(drop=True)
    out[bin_col] = lo[idx] + off
    return out


# ---------------------------------------------------------------------------
# Salted skew join (hot-key replication)
# ---------------------------------------------------------------------------

def sampled_hot_keys(fact_ds, key: str, *, threshold: int,
                     sample_every: int = 16) -> set:
    """Approximate hot-key detection for join salting: each batch keeps
    every ``sample_every``-th row, value_counts it, and emits only keys
    seen ≥2× in the sample slice; the driver folds the (tiny) partials and
    keeps keys whose sampled count clears ``threshold / sample_every / 2``
    (a 2× safety factor against sampling variance). Driver memory is
    O(keys frequent in the sample), not O(distinct keys).

    The hot set is a PERFORMANCE HINT, never a correctness input — every
    key joins exactly once whether or not it lands in the set — so the
    sampling approximation is safe by construction (same reasoning as
    Spark AQE's skew-join detection, a public design)."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[key].iloc[::sample_every].value_counts()
        vc = vc[vc >= 2]
        return pd.DataFrame({key: vc.index, "cnt": vc.to_numpy(np.int64)})

    samp = fact_ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(samp) == 0:
        return set()
    tot = samp.groupby(key)["cnt"].sum()
    cut = max(1.0, threshold / sample_every / 2.0)
    return set(tot[tot >= cut].index.tolist())


def salted_join(fact_ds, dim_ds, *, key: str, dim_key: str,
                hot: set, salts: int = 8, num_partitions: int | None = None,
                salt_col: str = "__salt"):
    """Inner hash join that breaks hot-key skew by salting: fact rows whose
    key is in ``hot`` get a round-robin salt in [0, salts) so one hot key's
    rows spread over ``salts`` join partitions instead of melting a single
    reducer; dim rows for hot keys are replicated once per salt (dim side
    is the small side — replication cost is |hot|×salts rows). Cold keys
    keep salt 0 on both sides, so each (fact, dim) pair still meets exactly
    once and the join result is EXACTLY the unsalted inner join.

    Salt assignment is arange-based (any spread is correct — the dim side
    covers every salt), so no per-row hash is paid on the fact side."""
    hot_ref = None
    import ray

    from crawler_ray.sizing import exchange_width

    num_partitions = num_partitions or exchange_width()
    hot_ref = ray.put(frozenset(hot))

    class SaltFact:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            s = np.zeros(len(b), np.int64)
            if self.hot:
                m = b[key].isin(self.hot).to_numpy()
                s[m] = np.arange(int(m.sum()), dtype=np.int64) % salts
            return b.assign(**{salt_col: s})

    class SaltDim:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            m = b[dim_key].isin(self.hot).to_numpy() if self.hot else np.zeros(len(b), bool)
            reps = np.where(m, salts, 1).astype(np.int64)
            idx = np.repeat(np.arange(len(b)), reps)
            off = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
            out = b.iloc[idx].reset_index(drop=True)
            out[salt_col] = off
            return out

    f = fact_ds.map_batches(SaltFact, batch_format="pandas", concurrency=(1, 8))
    d = dim_ds.map_batches(SaltDim, batch_format="pandas", concurrency=(1, 4))
    joined = f.join(d, join_type="inner", num_partitions=num_partitions,
                    on=(key, salt_col), right_on=(dim_key, salt_col))
    return joined.map_batches(
        lambda b: b.drop(columns=[salt_col, dim_key], errors="ignore"),
        batch_format="pandas")
