"""Distributed exact linear algebra over embedding columns.

The scale pattern: an (n × d) embedding corpus reduces to O(d²) MOMENT
PARTIALS per block — count, coordinate sums, and the d×d second-moment
matrix — which merge by plain addition. The driver folds blocks with
PYTHON-INT (arbitrary-precision) arithmetic, so the fold is exact at any
corpus size; nothing row-scale ever leaves the workers. Embeddings are
quantized to an integer grid first (``floor(float64(x) · scale)`` — floor,
not round: round-half rules differ between numpy and SQL engines, floor is
unambiguous), making every partial an exact integer: the same trick
``functions/cluster.py`` uses for bit-identical k-means.

From the exact moments:
- the scaled covariance entries ``m2[i,j] = n·S[i,j] − s[i]·s[j]``
  (= n²·cov · scale²) are DuckDB-checkable verbatim;
- PCA is a dense d×d eigensolve on the DRIVER (``np.linalg.eigh``) —
  O(d³) once, independent of corpus size. (A power-iteration variant was
  tried and rejected: random unit embeddings give a nearly-degenerate
  spectrum, λ₂/λ₁ ≈ 0.99, where power iteration needs thousands of
  rounds per component — the golden's independence lives in the moment
  computation, which is the distributed part.)

Public algorithms throughout (method of moments, dense symmetric
eigendecomposition).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_SCALE = 10_000  # |x|≤1 ⇒ |q|≤1e4 ⇒ block S entries ≤1e8·rows, int64-safe


def quantize_batch(emb_col, scale: int = DEFAULT_SCALE) -> np.ndarray:
    """(rows, d) int64 grid matrix from a list<float> column. float32 →
    float64 is exact, ×scale and floor are the same IEEE ops DuckDB's
    ``FLOOR(CAST(x AS DOUBLE) * scale)`` performs — bit-identical grids."""
    X = np.stack([np.asarray(v, np.float32) for v in emb_col]).astype(np.float64)
    return np.floor(X * scale).astype(np.int64)


def moment_partial(batch: pd.DataFrame, col: str = "embedding",
                   scale: int = DEFAULT_SCALE) -> pd.DataFrame:
    """Combiner: one row per block with (n, s, S) packed as bytes. All
    int64 — a block would need ≳9e18/1e8 ≈ 1e10 rows to overflow S, far
    past any block size; the DRIVER fold upgrades to Python ints."""
    if len(batch) == 0:
        return pd.DataFrame({"n": pd.Series([], dtype=np.int64),
                             "s": pd.Series([], dtype=object),
                             "S": pd.Series([], dtype=object)})
    q = quantize_batch(batch[col].to_numpy(), scale)
    return pd.DataFrame({"n": np.array([len(q)], np.int64),
                         "s": [q.sum(0).tobytes()],
                         "S": [(q.T @ q).tobytes()]})


def fold_moments(parts: pd.DataFrame, d: int) -> tuple[int, np.ndarray, np.ndarray]:
    """Driver fold of block partials → exact (n, s, S) with OBJECT-dtype
    (arbitrary-precision) arrays: exact at 10^10+ rows where n·S would
    overflow int64."""
    n = int(parts["n"].sum())
    s = np.zeros(d, object)
    S = np.zeros((d, d), object)
    for sb, Sb in zip(parts["s"], parts["S"]):
        s = s + np.frombuffer(sb, np.int64).astype(object)
        S = S + np.frombuffer(Sb, np.int64).reshape(d, d).astype(object)
    return n, s, S


def scaled_covariance(n: int, s: np.ndarray, S: np.ndarray) -> np.ndarray:
    """Exact integer matrix m2 = n·S − s·sᵀ (= n²·covariance·scale²)."""
    return n * S - np.outer(s, s)


def top_eigs(m2: np.ndarray, k: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """Top-k eigenpairs of the (symmetric PSD) scaled covariance — a
    driver-side d×d dense eigensolve, O(d³) once regardless of corpus
    size. Returns (eigvals desc, eigvecs[k, d]); eigvals are of m2, so
    trace-normalizing cancels the n²·scale² factor."""
    vals, vecs = np.linalg.eigh(m2.astype(np.float64))
    order = np.argsort(vals)[::-1][:k]
    return vals[order], vecs[:, order].T
