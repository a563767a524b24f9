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


class CuckooFilter:
    """Cuckoo filter (Fan et al., CoNLL'14 — public algorithm): 16-bit
    fingerprints, 4-slot buckets, partial-key cuckoo kicking. No false
    negatives (items that were successfully inserted always report maybe);
    lookups are fully vectorized (two bucket gathers + compare). A
    kick-limit overflow parks the evicted victim fingerprint in an orphan
    set (still answers 'maybe'), so inserts never lose residents; callers
    watch ``orphan_count`` and rebuild bigger when it grows (the caller's
    exact set remains the authority — the filter is a negative fast path)."""

    _KICK_LIMIT = 500

    def __init__(self, capacity_log2: int = 20, seed: int = 0x5EED):
        self.n_buckets = np.uint64(1 << capacity_log2)
        self.buckets = np.zeros((1 << capacity_log2, 4), np.uint16)
        self._rng = np.random.default_rng(seed)
        # Fingerprints orphaned by a kick-limit failure. The homeless
        # fingerprint after a failed kick chain belongs to a PREVIOUSLY
        # inserted item (the new item lands on the first swap), so dropping
        # it would create a false negative for that older item. Instead we
        # park the fingerprint here and treat any query whose fingerprint
        # matches as a 'maybe' (exact set resolves it).
        self._orphans: set[int] = set()
        self._orphans_arr = np.zeros(0, np.uint16)

    def _fingerprint(self, h: np.ndarray) -> np.ndarray:
        f = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(f == 0, np.uint16(1), f)  # 0 means empty slot

    def _index1(self, h: np.ndarray) -> np.ndarray:
        return (h % self.n_buckets).astype(np.int64)

    def _index2(self, i1: np.ndarray, f: np.ndarray) -> np.ndarray:
        # partial-key: i2 = i1 ^ hash(fingerprint)
        fh = (f.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87)) % self.n_buckets
        return (i1.astype(np.uint64) ^ fh).astype(np.int64) % int(self.n_buckets)

    def insert_many(self, hashes: np.ndarray) -> int:
        """Insert all; returns the current orphan count (kick-limit victims
        parked in the orphan set — every insert succeeds, items are never
        lost, but each orphan fingerprint forces ~1/65536 of queries onto
        the caller's exact-set slow path, so callers should rebuild at a
        bigger capacity once ``orphan_count`` crosses a threshold)."""
        f_all = self._fingerprint(hashes)
        i1_all = self._index1(hashes)
        i2_all = self._index2(i1_all, f_all)
        for f, i1, i2 in zip(f_all, i1_all, i2_all):
            self._insert_one(int(f), int(i1), int(i2))
        return len(self._orphans)

    @property
    def orphan_count(self) -> int:
        return len(self._orphans)

    def _insert_one(self, f: int, i1: int, i2: int) -> bool:
        for idx in (i1, i2):
            row = self.buckets[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = f
                return True
        idx = i1 if self._rng.random() < 0.5 else i2
        n = int(self.n_buckets)
        for _ in range(self._KICK_LIMIT):
            slot = int(self._rng.integers(0, 4))
            f, self.buckets[idx][slot] = int(self.buckets[idx][slot]), f
            # same wrap-around math as the vectorized _index2 (uint64 mod 2^64)
            fh = ((f * 0x9E3779B185EBCA87) & 0xFFFFFFFFFFFFFFFF) % n
            idx = (idx ^ fh) % n
            row = self.buckets[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = f
                return True
        # Kick limit hit: the carried f is an evicted victim, not the new
        # item. Keep it queryable via the orphan set (never lose a resident).
        self._orphans.add(int(f))
        self._orphans_arr = np.fromiter(self._orphans, np.uint16, len(self._orphans))
        return True

    def maybe_contains(self, hashes: np.ndarray) -> np.ndarray:
        f = self._fingerprint(hashes)
        i1 = self._index1(hashes)
        i2 = self._index2(i1, f)
        hit1 = (self.buckets[i1] == f[:, None]).any(axis=1)
        hit2 = (self.buckets[i2] == f[:, None]).any(axis=1)
        hits = hit1 | hit2
        if len(self._orphans_arr):
            hits |= np.isin(f, self._orphans_arr)
        return hits


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard of the URL-seen set: cuckoo-filter fast path (vectorized
    negative lookups) backed by an exact hash set (the reproducibility
    authority — cuckoo false positives are re-checked exactly; inserts never
    fail because kick-limit victims park in the filter's orphan set, and the
    shard rebuilds the filter at double capacity once orphans accumulate,
    so there are never false negatives and the slow path stays rare)."""

    _ORPHAN_REBUILD = 64  # each orphan degrades ~1/65536 of queries

    def __init__(self, capacity_log2: int = 20):
        self._set: set[int] = set()
        self._capacity_log2 = capacity_log2
        self._cuckoo = CuckooFilter(capacity_log2)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, bool)
        hashes = np.asarray(hashes, np.uint64)
        maybe = self._cuckoo.maybe_contains(hashes)
        out = np.zeros(len(hashes), bool)
        idx = np.nonzero(maybe)[0]
        if len(idx):
            s = self._set
            out[idx] = [int(h) in s for h in hashes[idx]]
        return out

    def add(self, hashes: np.ndarray) -> int:
        if len(hashes) == 0:
            return len(self._set)
        hashes = np.asarray(hashes, np.uint64)
        new = np.fromiter((int(h) not in self._set for h in hashes), bool, len(hashes))
        self._set.update(int(h) for h in hashes[new])
        if new.any():
            orphans = self._cuckoo.insert_many(hashes[new])
            if orphans > self._ORPHAN_REBUILD:
                self._rebuild()
        return len(self._set)

    def _rebuild(self) -> None:
        """Saturated filter: rebuild at double capacity from the exact set
        (the authority) instead of accumulating orphans forever."""
        self._capacity_log2 += 1
        self._cuckoo = CuckooFilter(self._capacity_log2)
        self._cuckoo.insert_many(np.fromiter(self._set, np.uint64, len(self._set)))

    def restore_from(self, paths: list[str], num_shards: int, shard_id: int) -> int:
        """Resume path: read the url_hash column of the seen fragments
        INSIDE the actor and keep only this shard's partition — the driver
        never materializes the full seen history (each shard streams its own
        column scan in parallel; at cluster scale, write seen fragments
        bucketed by shard id so each actor opens only its own files)."""
        import pyarrow.parquet as pq

        for p in paths:
            h = pq.read_table(p, columns=["url_hash"])["url_hash"].to_numpy()
            h = np.asarray(h, np.uint64)
            mine = h[(h % np.uint64(num_shards)).astype(np.int64) == shard_id]
            if len(mine):
                self.add(mine)
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

    def restore_from_fragments(self, paths: list[str]) -> None:
        """Parallel shard-side restore: each shard actor scans the seen
        fragments' url_hash column and keeps its own partition."""
        ray.get([
            s.restore_from.remote(paths, self.num_shards, i)
            for i, s in enumerate(self.shards)
        ])

    def total(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))
