"""Mergeable sketches for corpus-scale statistics.

HyperLogLog distinct counting (Flajolet, Fusy, Gandouet, Meunier 2007 —
public algorithm) with the standard small-range linear-counting
correction. The per-batch kernel reduces a token stream to a fixed
2^P-register array in one vectorized pass; registers merge by elementwise
max, the canonical combiner shape for ``map_batches`` partials: at corpus
scale the driver receives (groups × 4 KiB) register blobs, never values.
The sketch is DETERMINISTIC (xxh64 token hashes), so a straight-line
independent implementation reproduces the estimate bit-for-bit — which is
what makes it golden-checkable (tools/make_goldens.py).

The reference engine has no sketch surface; this extends SURVEY.md §2.8's
scalar functions with the approximate-distinct operation a 100 TB dedup /
vocabulary audit needs (exact distinct = doc_fingerprints' sort+fold path;
this is the one-pass, no-shuffle alternative).
"""

from __future__ import annotations

import numpy as np

P = 12  # 4096 registers ⇒ ~1.6 % standard error, 4 KiB per group
M = 1 << P


def _hll_idx_rho(hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Register index = top P hash bits; rho = 1-based position of the
    first set bit in the remaining 64-P bits (64-P+1 when all zero). The
    leading-zero count is an exact 6-step vectorized binary search — no
    float tricks (a float64 mantissa would misplace low-bit leaders)."""
    h = np.asarray(hashes, np.uint64)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = h << np.uint64(P)
    lz = np.zeros(len(h), np.uint64)
    x = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = x < np.uint64(1) << np.uint64(64 - shift)
        lz[m] += np.uint64(shift)
        x[m] <<= np.uint64(shift)
    rho = np.where(rest == np.uint64(0), 64 - P + 1, lz + 1).astype(np.uint8)
    return idx, rho


def hll_registers(hashes: np.ndarray) -> np.ndarray:
    """Fold a batch of 64-bit hashes into a fresh 2^P uint8 register array."""
    regs = np.zeros(M, np.uint8)
    if len(hashes) == 0:
        return regs
    idx, rho = _hll_idx_rho(hashes)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_registers_grouped(hashes: np.ndarray, group_codes: np.ndarray,
                          n_groups: int) -> np.ndarray:
    """Fold a batch of (hash, group) pairs into an (n_groups, 2^P) register
    matrix in ONE ``np.maximum.at`` over flattened indices — the fully
    vectorized multi-group partial (identical registers to calling
    ``hll_registers`` per group; tested bit-equal)."""
    regs = np.zeros((n_groups, M), np.uint8)
    if len(hashes) == 0:
        return regs
    idx, rho = _hll_idx_rho(hashes)
    flat = np.asarray(group_codes, np.int64) * M + idx
    np.maximum.at(regs.reshape(-1), flat, rho)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Registers merge by elementwise max — associative and idempotent, so
    partials combine at any tree depth (batch → block → driver)."""
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Raw HLL estimator + linear counting below 2.5·m (the published
    small-range correction; the large-range 2^64 correction is irrelevant
    at any real corpus size)."""
    m = float(M)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return est
