"""Sharded URL-seen set: exactness, routing, snapshot/restore."""

import numpy as np

from crawler_ray.state.seen import ShardedSeen, _BloomFast


def test_bloom_no_false_negatives():
    b = _BloomFast(bits_log2=16)
    rng = np.random.default_rng(1)
    added = rng.integers(0, 2**63, 1000, dtype=np.uint64)
    b.add(added)
    assert b.maybe_contains(added).all()


def test_sharded_seen_exactness(ray_session):
    seen = ShardedSeen(num_shards=4)
    rng = np.random.default_rng(2)
    a = rng.integers(0, 2**63, 5000, dtype=np.uint64)
    b = rng.integers(2**63, 2**64 - 1, 5000, dtype=np.uint64)
    assert not seen.contains(a).any()
    seen.add(a)
    assert seen.contains(a).all()
    assert not seen.contains(b).any()       # exact: zero false positives
    assert seen.total() == len(np.unique(a))


def test_snapshot_restore(ray_session):
    import ray

    seen = ShardedSeen(num_shards=2)
    h = np.arange(100, dtype=np.uint64) * np.uint64(2654435761)
    seen.add(h)
    snaps = np.concatenate(ray.get([s.snapshot.remote() for s in seen.shards]))
    fresh = ShardedSeen(num_shards=3)  # different shard count on restore is fine
    fresh.restore(snaps)
    assert fresh.contains(h).all()
    assert fresh.total() == 100
