"""Sharded URL-seen set: cuckoo filter, exactness, routing, snapshot/restore."""

import numpy as np

from crawler_ray.state.seen import CuckooFilter, ShardedSeen


def test_cuckoo_no_false_negatives_and_low_fp():
    cf = CuckooFilter(capacity_log2=14)  # 16k buckets × 4 = 65k slots
    rng = np.random.default_rng(1)
    added = rng.integers(1, 2**64 - 1, 40000, dtype=np.uint64)
    cf.insert_many(added)
    assert cf.maybe_contains(added).all()  # no false negatives, ever
    fresh = rng.integers(1, 2**64 - 1, 100000, dtype=np.uint64)
    fresh = fresh[~np.isin(fresh, added)]
    fp = cf.maybe_contains(fresh).mean()
    assert fp < 0.01  # 16-bit fingerprints → ~0.01-0.1% expected


def test_cuckoo_overflow_never_false_negative():
    # Overfill an 8×-too-small filter: kick-limit evictions park victim
    # fingerprints in the orphan set, so EVERY inserted item — including
    # earlier items whose fingerprint was evicted later — still reports
    # 'maybe' (the no-false-negatives invariant; ADVICE r1 medium finding).
    cf = CuckooFilter(capacity_log2=6)  # 64 buckets × 4 = 256 slots
    rng = np.random.default_rng(2)
    many = rng.integers(1, 2**64 - 1, 2000, dtype=np.uint64)
    cf.insert_many(many)
    assert cf.orphan_count > 0  # saturation actually exercised
    assert cf.maybe_contains(many).all()


def test_shard_rebuilds_on_orphan_saturation():
    # A SeenShard whose filter saturates rebuilds it at double capacity from
    # the exact set instead of accumulating orphans forever (ADVICE r2):
    # exactness is preserved throughout and orphans drop back under the bar.
    from crawler_ray.state.seen import SeenShard

    shard = SeenShard.__ray_metadata__.modified_class(capacity_log2=6)
    rng = np.random.default_rng(3)
    many = rng.integers(1, 2**64 - 1, 4000, dtype=np.uint64)
    for i in range(0, len(many), 500):
        shard.add(many[i : i + 500])
    assert shard._capacity_log2 > 6  # rebuild actually happened
    assert shard._cuckoo.orphan_count <= shard._ORPHAN_REBUILD
    assert shard.contains(many).all()
    fresh = rng.integers(1, 2**64 - 1, 4000, dtype=np.uint64)
    fresh = fresh[~np.isin(fresh, many)]
    assert not shard.contains(fresh).any()


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


def test_restore_from_fragments(ray_session, tmp_path):
    """Shard-side resume: each shard scans the seen fragments itself and
    keeps only its partition — result equals a direct add of all hashes."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(5)
    hashes = np.unique(rng.integers(1, 2**64 - 1, 5000, dtype=np.uint64))
    paths = []
    for i, part in enumerate(np.array_split(hashes, 3)):
        p = str(tmp_path / f"seen-{i}.parquet")
        pq.write_table(pa.table({"url_hash": part,
                                 "url": [f"u{h}" for h in part]}), p)
        paths.append(p)
    seen = ShardedSeen(num_shards=4)
    seen.restore_from_fragments(paths)
    assert seen.total() == len(hashes)
    assert seen.contains(hashes).all()
    other = rng.integers(1, 2**64 - 1, 2000, dtype=np.uint64)
    other = other[~np.isin(other, hashes)]
    assert not seen.contains(other).any()
