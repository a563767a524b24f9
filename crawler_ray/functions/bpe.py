"""Byte-pair-encoding tokenizer: distributed merge training + vectorized
encode (Sennrich, Haddow, Birch 2016 — public algorithm).

The two halves a training-data pipeline needs at 100 TB:

- **train_bpe_ds**: learn the merge table once, on a (deterministic,
  hash-sampled) slice of the corpus — the industry-standard shape; a
  trainer never needs the full corpus. Each round counts adjacent-token
  pairs with the combiner → driver-fold shape (per-block ``value_counts``
  partials; the driver folds O(distinct pairs in sample) rows) and picks
  the argmax with a total-order tie-break (count desc, pair asc), then
  applies ONLY the newest rule to the materialized token state — round r
  costs one pass over the sample, not r re-applications.
- **encode_batch / apply_merges_flat**: the per-batch encode pass that DOES
  run over the full corpus, with the merge table broadcast in the closure
  (a merge table is KBs). Each rule applies in one vectorized scan over the
  batch's flattened token array — candidate mask, run-split for the
  overlapping a==b case (left-to-right greediness: keep every other
  candidate inside a run), mask-compaction — never a per-row or per-token
  Python loop.

Applying rules in rank order with one exhaustive left-to-right pass each is
equivalent to the canonical lowest-rank-first loop: a merge at rank r only
creates adjacencies involving its output symbol, and every rule consuming
that symbol was learned later (rank > r), so no earlier rule can become
applicable again.

Token representation: documents are split on single spaces (the fixture is
strictly single-space-joined); a merged symbol joins its parts with the
``\\x1f`` unit separator, so the pair/display form (parts joined by spaces)
is always recoverable and ``detokenize`` is an exact inverse.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEP = "\x1f"


def _flatten(toks: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat token array, flat doc-ordinal array, per-doc counts) from a
    Series of per-doc token lists. Docs stay contiguous by construction."""
    counts = toks.str.len().fillna(0).to_numpy(np.int64)
    flat = toks.explode().dropna().to_numpy(object)
    doc = np.repeat(np.arange(len(toks), dtype=np.int64), counts)
    return flat, doc, counts


def _unflatten(flat: np.ndarray, doc: np.ndarray, n_docs: int) -> pd.Series:
    if n_docs == 0:
        # np.split of an empty array still yields ONE empty chunk — a
        # phantom 1-row Series for a 0-doc frame (ADVICE r05)
        return pd.Series([], dtype=object)
    counts = np.bincount(doc, minlength=n_docs)
    return pd.Series(np.split(flat, np.cumsum(counts)[:-1]))


def apply_merge_flat(flat: np.ndarray, doc: np.ndarray, a: str, b: str
                     ) -> tuple[np.ndarray, np.ndarray]:
    """One exhaustive left-to-right application of rule (a, b) → a␟b over
    the flattened (token, doc) arrays — one vectorized scan, overlap-safe."""
    n = len(flat)
    if n < 2:
        return flat, doc
    cand = np.zeros(n, bool)
    cand[:-1] = (flat[:-1] == a) & (flat[1:] == b) & (doc[:-1] == doc[1:])
    idx = np.flatnonzero(cand)
    if len(idx) == 0:
        return flat, doc
    # runs of consecutive candidate positions occur only when a == b
    # ("a a a a"); left-to-right greediness keeps candidates at even
    # offsets within each run
    new_run = np.r_[True, np.diff(idx) != 1]
    run_start = idx[new_run][np.cumsum(new_run) - 1]
    sel = idx[((idx - run_start) % 2) == 0]
    out = flat.copy()
    out[sel] = a + SEP + b
    drop = np.zeros(n, bool)
    drop[sel + 1] = True
    return out[~drop], doc[~drop]


def apply_merges_flat(flat: np.ndarray, doc: np.ndarray,
                      merges: list[tuple[str, str]]
                      ) -> tuple[np.ndarray, np.ndarray]:
    for a, b in merges:
        flat, doc = apply_merge_flat(flat, doc, a, b)
    return flat, doc


def encode_batch(b: pd.DataFrame, merges: list[tuple[str, str]],
                 text_col: str = "text", out_col: str = "toks") -> pd.DataFrame:
    """map_batches body: text → merged-token lists under ``out_col``."""
    toks = b[text_col].astype("string").str.split(" ")
    flat, doc, _ = _flatten(toks)
    flat, doc = apply_merges_flat(flat, doc, merges)
    out = _unflatten(flat, doc, len(b))
    out.index = b.index  # don't rely on RangeIndex alignment in assign
    return b.assign(**{out_col: out})


def detokenize(flat: np.ndarray) -> np.ndarray:
    """Exact inverse of encoding: split merged symbols back to base tokens
    (used by the round-trip invariant test)."""
    s = pd.Series(flat, dtype=object).str.split(SEP)
    return s.explode().to_numpy(object)


def _pair_counts_flat(flat: np.ndarray, doc: np.ndarray) -> pd.DataFrame:
    if len(flat) < 2:
        return pd.DataFrame({"tok_a": pd.Series([], dtype=object),
                             "tok_b": pd.Series([], dtype=object),
                             "cnt": pd.Series([], dtype=np.int64)})
    m = doc[:-1] == doc[1:]
    pairs = pd.DataFrame({"tok_a": flat[:-1][m], "tok_b": flat[1:][m]})
    vc = pairs.value_counts()
    out = vc.index.to_frame(index=False)
    out["cnt"] = vc.to_numpy(np.int64)
    return out


def pair_counts_batch(b: pd.DataFrame, toks_col: str = "toks") -> pd.DataFrame:
    """Combiner partial: per-block adjacent-pair counts (tok_a, tok_b, cnt)
    over already-encoded token lists — one explode + shift, no row loop."""
    flat, doc, _ = _flatten(b[toks_col])
    return _pair_counts_flat(flat, doc)


# below this many sampled docs the 2·n_merges Dataset executions are pure
# fixed cost (~0.5 s each); the identical kernels run driver-local instead
# — the same tiny-tail-wave policy the crawl uses (pipelines/crawl.py)
LOCAL_TRAIN_DOCS = 50_000


def _pick_best(tot: pd.DataFrame, min_count: int) -> tuple[str, str] | None:
    tot = tot.sort_values(["cnt", "tok_a", "tok_b"],
                          ascending=[False, True, True], kind="mergesort")
    if len(tot) == 0 or int(tot.iloc[0]["cnt"]) < min_count:
        return None
    return str(tot.iloc[0]["tok_a"]), str(tot.iloc[0]["tok_b"])


def _train_local(toks: pd.Series, n_merges: int, min_count: int
                 ) -> list[tuple[str, str]]:
    """Driver-local rounds over the SAME vectorized kernels (one flatten,
    then per-round one pair count + one merge application in place)."""
    flat, doc, _ = _flatten(toks)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = _pick_best(_pair_counts_flat(flat, doc), min_count)
        if best is None:
            break
        merges.append(best)
        flat, doc = apply_merge_flat(flat, doc, *best)
    return merges


def train_bpe_ds(ds, n_merges: int, text_col: str = "text",
                 min_count: int = 2) -> list[tuple[str, str]]:
    """Learn ``n_merges`` rules from a Dataset of documents. The token
    state is materialized once and re-materialized per round with ONLY the
    newest rule applied (incremental re-encode). The caller passes the
    training slice — at corpus scale that is a hash-sampled fraction, and
    the driver fold per round is O(distinct pairs in that slice). Samples
    below ``LOCAL_TRAIN_DOCS`` train driver-local with the identical
    kernels (the distributed rounds would be ~100 % executor fixed cost);
    both paths produce the same rule table by construction (unit-pinned)."""
    state = ds.map_batches(
        lambda b: pd.DataFrame({
            "toks": b[text_col].astype("string").str.split(" ")
                    .map(lambda x: np.asarray(x, object))}),
        batch_format="pandas").materialize()
    if state.count() <= LOCAL_TRAIN_DOCS:
        return _train_local(state.to_pandas()["toks"], n_merges, min_count)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        parts = state.map_batches(pair_counts_batch,
                                  batch_format="pandas").to_pandas()
        if len(parts) == 0:
            break
        best = _pick_best(parts.groupby(["tok_a", "tok_b"], as_index=False)
                          .agg(cnt=("cnt", "sum")), min_count)
        if best is None:
            break
        a, b = best
        merges.append((a, b))

        def apply_newest(batch: pd.DataFrame, a=a, b=b) -> pd.DataFrame:
            flat, doc, _ = _flatten(batch["toks"])
            flat, doc = apply_merge_flat(flat, doc, a, b)
            return pd.DataFrame({"toks": _unflatten(flat, doc, len(batch))})

        state = state.map_batches(apply_newest, batch_format="pandas").materialize()
    return merges
