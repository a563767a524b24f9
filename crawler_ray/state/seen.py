"""Sharded URL-seen set — the shared mutable index of the crawl.

The reference keeps a *per-worker* Bloom filter (worker.py:241 — not shared,
not persisted, FP≈0.1%). The rebuild upgrades it to the one piece of state
the Dataset API genuinely can't express (SURVEY.md T1/D1): a pool of
``@ray.remote`` shard actors, each owning an exact hash set for
``url_hash % num_shards == shard_id``, fronted by a split-block Bloom filter
for O(1) negative checks. Exactness makes the URL-seen set reproducible
(bit-identical resume); the Bloom fast-path is consulted first so the set
lookup only runs on potential hits.

Routing happens inside ``map_batches`` stages: a batch's hashes are
partitioned by shard id client-side and each shard receives one numpy array
per batch (vectorized adds/queries — no per-URL RPCs).
"""

from __future__ import annotations

import numpy as np
import ray


class _BloomFast:
    """Small vectorized Bloom front (k=4) over a power-of-two bit array."""

    def __init__(self, bits_log2: int = 24):
        self.mask = np.uint64((1 << bits_log2) - 1)
        self.words = np.zeros(1 << max(0, bits_log2 - 6), np.uint64)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        # 4 derived positions per hash via multiply-shift remixing
        mults = np.array([0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                          0x165667B19E3779F9, 0x85EBCA77C2B2AE63], np.uint64)
        return ((h[:, None] * mults[None, :]) >> np.uint64(13)) & self.mask

    def add(self, h: np.ndarray) -> None:
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))

    def maybe_contains(self, h: np.ndarray) -> np.ndarray:
        pos = self._positions(h)
        bits = (self.words[(pos >> np.uint64(6)).astype(np.int64)]
                >> (pos & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=1)


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard of the URL-seen set (exact set + Bloom fast path)."""

    def __init__(self):
        self._set: set[int] = set()
        self._bloom = _BloomFast()

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, bool)
        maybe = self._bloom.maybe_contains(hashes)
        out = np.zeros(len(hashes), bool)
        idx = np.nonzero(maybe)[0]
        if len(idx):
            s = self._set
            out[idx] = [int(h) in s for h in hashes[idx]]
        return out

    def add(self, hashes: np.ndarray) -> int:
        self._set.update(int(h) for h in hashes)
        if len(hashes):
            self._bloom.add(np.asarray(hashes, np.uint64))
        return len(self._set)

    def snapshot(self) -> np.ndarray:
        return np.fromiter(self._set, np.uint64, len(self._set))

    def size(self) -> int:
        return len(self._set)


class ShardedSeen:
    """Driver-side handle to the shard pool."""

    def __init__(self, num_shards: int = 8):
        self.num_shards = num_shards
        self.shards = [SeenShard.remote() for _ in range(num_shards)]

    def _route(self, hashes: np.ndarray) -> list[np.ndarray]:
        sid = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        return [np.nonzero(sid == s)[0] for s in range(self.num_shards)]

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes, np.uint64)
        out = np.zeros(len(hashes), bool)
        parts = self._route(hashes)
        refs = [self.shards[s].contains.remote(hashes[idx]) for s, idx in enumerate(parts) if len(idx)]
        live = [idx for idx in parts if len(idx)]
        for idx, res in zip(live, ray.get(refs)):
            out[idx] = res
        return out

    def add(self, hashes: np.ndarray) -> None:
        hashes = np.asarray(hashes, np.uint64)
        refs = []
        for s, idx in enumerate(self._route(hashes)):
            if len(idx):
                refs.append(self.shards[s].add.remote(hashes[idx]))
        ray.get(refs)

    def restore(self, hashes: np.ndarray) -> None:
        self.add(hashes)

    def total(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))
