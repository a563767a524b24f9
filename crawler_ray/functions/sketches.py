"""Mergeable sketches for corpus-scale statistics.

Three public-algorithm sketch families, all shaped as ``map_batches``
combiners (per-batch partial → elementwise merge → tiny driver fold):

- **HyperLogLog** (Flajolet, Fusy, Gandouet, Meunier 2007): approximate
  distinct counting; registers merge by elementwise max.
- **Bloom filter** (Bloom 1970, double hashing per Kirsch–Mitzenmacher
  2006): set-membership pruning for shuffle-free semi-joins; word arrays
  merge by bitwise OR. Never a false negative, so a downstream exact
  verify join over the (small) survivor set restores exactness.
- **Count-Min sketch** (Cormode–Muthukrishnan 2005): approximate
  frequencies; count matrices merge by elementwise add. Never an
  underestimate, so "estimate ≥ T" candidates provably contain every true
  φ-heavy hitter and an exact second pass restores exactness.

HyperLogLog carries the standard small-range linear-counting
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

# ---------------------------------------------------------------------------
# Bloom filter (bitwise-OR-mergeable membership sketch)
# ---------------------------------------------------------------------------

BLOOM_K = 7  # probes; ~0.8 % false positives at 10 bits/key


def bloom_m_bits(n_keys: int, bits_per_key: int = 10) -> int:
    """Power-of-two bit width sized for ``n_keys`` at ``bits_per_key``
    (10 bits + 7 probes ⇒ <1 % FP). Power-of-two keeps the probe a mask,
    and lets partials built for the SAME n_keys bound merge bit-for-bit."""
    want = max(1, n_keys) * bits_per_key
    p = 13  # 8 Kibit floor = 1 KiB
    while (1 << p) < want:
        p += 1
    return 1 << p


def _bloom_idx(h: np.ndarray, m_bits: int, i: int) -> np.ndarray:
    """i-th probe index via Kirsch–Mitzenmacher double hashing: two 64-bit
    halves of one xxh64/murmur64 value stand in for k independent hashes
    (g_i = h1 + i·h2), h2 forced odd so probes cycle the full table."""
    h = np.asarray(h, np.uint64)
    h2 = (h >> np.uint64(17)) | np.uint64(1)
    return ((h + np.uint64(i) * h2) & np.uint64(m_bits - 1))


def bloom_build(hashes: np.ndarray, m_bits: int, k: int = BLOOM_K) -> np.ndarray:
    """Fold a batch of 64-bit key hashes into a fresh packed uint64 word
    array (m_bits/64 words). Partials over the same m_bits merge by
    bitwise OR at any tree depth."""
    words = np.zeros(m_bits >> 6, np.uint64)
    if len(hashes) == 0:
        return words
    for i in range(k):
        idx = _bloom_idx(hashes, m_bits, i)
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))
    return words


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.bitwise_or(a, b)


def bloom_contains(words: np.ndarray, hashes: np.ndarray,
                   k: int = BLOOM_K) -> np.ndarray:
    """Vectorized membership probe → bool mask. False positives possible
    (bounded by the build's bits/key); false negatives impossible — the
    contract the semi-join prune relies on."""
    m_bits = len(words) << 6
    n = len(hashes)
    mask = np.ones(n, bool)
    if n == 0:
        return mask
    for i in range(k):
        idx = _bloom_idx(hashes, m_bits, i)
        bit = (words[(idx >> np.uint64(6)).astype(np.int64)]
               >> (idx & np.uint64(63))) & np.uint64(1)
        mask &= bit.astype(bool)
    return mask


# ---------------------------------------------------------------------------
# Count-Min sketch (elementwise-add-mergeable frequency sketch)
# ---------------------------------------------------------------------------

CMS_D = 4          # rows ⇒ error probability (1/2)^… per Cormode–Muthukrishnan
CMS_W_LOG2 = 14
CMS_W = 1 << CMS_W_LOG2  # 16384 columns ⇒ ε ≈ e/W ≈ 1.7e-4 of stream mass

_CMS_SEEDS = np.array([0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9,
                       0x94D049BB133111EB, 0xD6E8FEB86659FD93], np.uint64)


def _cms_rows(hashes: np.ndarray) -> np.ndarray:
    """(CMS_D, n) column indices: each row remixes the input 64-bit hash
    with its own odd multiplier + xorshift (splitmix64-style finalizer),
    keeping the top CMS_W_LOG2 bits — pairwise-independent enough for the
    CM guarantee, one upstream hash pass per batch."""
    h = np.asarray(hashes, np.uint64)
    idx = np.empty((CMS_D, len(h)), np.int64)
    for d in range(CMS_D):
        x = h * _CMS_SEEDS[d]
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xD6E8FEB86659FD93)
        idx[d] = (x >> np.uint64(64 - CMS_W_LOG2)).astype(np.int64)
    return idx


def cms_build(hashes: np.ndarray, weights: np.ndarray | None = None) -> np.ndarray:
    """Fold a batch of (hash, weight) pairs into a fresh (CMS_D, CMS_W)
    int64 count matrix (512 KiB). Callers pass pre-aggregated per-batch
    ``value_counts`` weights so the add touches each DISTINCT key once."""
    cms = np.zeros((CMS_D, CMS_W), np.int64)
    if len(hashes) == 0:
        return cms
    idx = _cms_rows(hashes)
    w = (np.ones(len(hashes), np.int64) if weights is None
         else np.asarray(weights, np.int64))
    for d in range(CMS_D):
        np.add.at(cms[d], idx[d], w)
    return cms


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Counts are linear, so partials merge by elementwise add at any tree
    depth — the canonical combiner shape."""
    return a + b


def cms_query(cms: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point-frequency estimates = min over the CMS_D rows. Estimates NEVER
    undercount (only colliding adds inflate them), which is what makes the
    heavy-hitter candidate set a superset of the true φ-heavy set."""
    n = len(hashes)
    if n == 0:
        return np.zeros(0, np.int64)
    idx = _cms_rows(hashes)
    est = cms[0][idx[0]]
    for d in range(1, CMS_D):
        est = np.minimum(est, cms[d][idx[d]])
    return est
