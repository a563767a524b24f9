"""xxhash64 — pure-Python scalar + numpy-vectorized batch implementation.

The north rule (BASELINE.json) keys URL identity and partitioning on
``xxhash64(canonical_url)``. The ``xxhash`` wheel is not available in this
environment, so this module implements the public XXH64 algorithm
(https://github.com/Cyan4973/xxHash — the spec is public domain) twice:

- ``xxh64(data, seed)``        — scalar reference, used in tests/oracle.
- ``xxh64_array(arr, seed)``   — numpy-vectorized over a pyarrow / pandas /
  list string|binary column; processes all rows simultaneously, looping only
  over 32-byte stripe *positions* (bounded by the longest string), so a batch
  of 64k URLs costs a few hundred numpy kernel calls, not 64k Python calls.

Replaces the reference's sha256 content hashing (cache_service.py:49-51)
and per-worker Bloom keys (worker.py:241) with a single 64-bit key space.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes | str, seed: int = 0) -> int:
    """Scalar XXH64 of ``data`` (str is UTF-8 encoded). Returns uint64."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while n - pos >= 32:
            lanes = [int.from_bytes(data[pos + 8 * j : pos + 8 * j + 8], "little") for j in range(4)]
            v1 = _round(v1, lanes[0])
            v2 = _round(v2, lanes[1])
            v3 = _round(v3, lanes[2])
            v4 = _round(v4, lanes[3])
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while n - pos >= 8:
        lane = int.from_bytes(data[pos : pos + 8], "little")
        h ^= _round(0, lane)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        pos += 8
    if n - pos >= 4:
        lane = int.from_bytes(data[pos : pos + 4], "little")
        h ^= (lane * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Vectorized path
# ---------------------------------------------------------------------------

_U = np.uint64


def _vrotl(x: np.ndarray, r: int) -> np.ndarray:
    r = _U(r)
    return (x << r) | (x >> (_U(64) - r))


def _vround(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    acc = acc + lane * _U(_P2)
    return _vrotl(acc, 31) * _U(_P1)


def _to_padded(values) -> tuple[np.ndarray, np.ndarray]:
    """Column of str/bytes → (zero-padded uint8 matrix [n, W], lengths[n]).

    W is a multiple of 32 with 32 bytes of slack so every (masked) u64/u32
    gather stays in bounds. Goes through Arrow buffers — no per-row Python.
    """
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(values)
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if pa.types.is_null(values.type):  # empty or all-null column
        values = values.cast(pa.binary())
    if pa.types.is_string(values.type):
        values = values.cast(pa.binary())
    elif pa.types.is_large_string(values.type):
        values = values.cast(pa.large_binary())
    if pa.types.is_binary(values.type):
        off_dtype = np.int32
    elif pa.types.is_large_binary(values.type):
        off_dtype = np.int64
    else:
        raise TypeError(f"unsupported array type {values.type}")
    n = len(values)
    if n == 0:
        return np.zeros((0, 32), np.uint8), np.zeros(0, np.int64)
    if values.null_count:
        values = values.fill_null(b"")
    buffers = values.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype, count=n + 1, offset=values.offset * np.dtype(off_dtype).itemsize).astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.zeros(0, np.uint8)
    lengths = np.diff(offsets)
    max_len = int(lengths.max(initial=0))
    w = ((max_len + 31) // 32) * 32 + 32
    padded = np.zeros((n, w), np.uint8)
    # flat scatter: the source bytes are one contiguous slice of the Arrow
    # data buffer; destination = row_start + position-in-row
    chunk = data[offsets[0] : offsets[-1]]
    total = len(chunk)
    rel_starts = offsets[:-1] - offsets[0]
    # row index per source byte via cumsum of row-start markers (np.repeat is
    # far slower than cumsum+gather for this on large inputs)
    row_idx = np.zeros(total, np.int64)
    starts = rel_starts[1:]
    starts = starts[starts < total]  # trailing empty rows have no bytes
    np.add.at(row_idx, starts, 1)   # duplicates (empty rows) accumulate correctly
    row_idx = np.cumsum(row_idx)
    pos_in_row = np.arange(total, dtype=np.int64) - rel_starts[row_idx]
    padded.ravel()[row_idx * w + pos_in_row] = chunk
    return padded, lengths


def xxh64_array(values, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 over a string/binary column → uint64 ndarray."""
    padded, lengths = _to_padded(values)
    n = len(lengths)
    if n == 0:
        return np.zeros(0, _U)
    u64 = padded.view("<u8")
    u32 = padded.view("<u4")
    rows = np.arange(n)
    lengths_u = lengths.astype(_U)
    seed_u = _U(seed & _M)

    n_stripes = lengths // 32
    has_stripes = lengths >= 32
    v1 = np.full(n, (seed + _P1 + _P2) & _M, _U)
    v2 = np.full(n, (seed + _P2) & _M, _U)
    v3 = np.full(n, seed & _M, _U)
    v4 = np.full(n, (seed - _P1) & _M, _U)
    for s in range(int(n_stripes.max(initial=0))):
        m = s < n_stripes
        base = s * 4
        v1 = np.where(m, _vround(v1, u64[:, base + 0]), v1)
        v2 = np.where(m, _vround(v2, u64[:, base + 1]), v2)
        v3 = np.where(m, _vround(v3, u64[:, base + 2]), v3)
        v4 = np.where(m, _vround(v4, u64[:, base + 3]), v4)
    h_big = _vrotl(v1, 1) + _vrotl(v2, 7) + _vrotl(v3, 12) + _vrotl(v4, 18)
    for v in (v1, v2, v3, v4):
        h_big = (h_big ^ _vround(np.zeros(n, _U), v)) * _U(_P1) + _U(_P4)
    h = np.where(has_stripes, h_big, seed_u + _U(_P5))
    h = h + lengths_u

    tail_start = n_stripes * 32
    tail_len = lengths - tail_start
    n8 = tail_len // 8
    for t in range(3):
        m = t < n8
        lane = u64[rows, tail_start // 8 + t]
        cand = (_vrotl(h ^ _vround(np.zeros(n, _U), lane), 27)) * _U(_P1) + _U(_P4)
        h = np.where(m, cand, h)
    off4 = tail_start + n8 * 8
    has4 = (tail_len - n8 * 8) >= 4
    lane32 = u32[rows, off4 // 4].astype(_U)
    cand = _vrotl(h ^ (lane32 * _U(_P1)), 23) * _U(_P2) + _U(_P3)
    h = np.where(has4, cand, h)
    offb = off4 + np.where(has4, 4, 0)
    nb = tail_len - n8 * 8 - np.where(has4, 4, 0)
    for b in range(3):
        m = b < nb
        byte = padded[rows, offb + b].astype(_U)
        cand = _vrotl(h ^ (byte * _U(_P5)), 11) * _U(_P1)
        h = np.where(m, cand, h)

    h ^= h >> _U(33)
    h *= _U(_P2)
    h ^= h >> _U(29)
    h *= _U(_P3)
    h ^= h >> _U(32)
    return h
