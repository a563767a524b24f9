"""Store maintenance: fragment compaction + version vacuum.

The Lance `compact_files` / `cleanup_old_versions` pair over the
lance_layout store (SURVEY §2.1 S5): coalescing must be invisible to
readers (bit-identical logical table, order preserved), idempotent
(content-derived names; second run publishes nothing), kill-safe
(unpublished rewrites are invisible and re-creatable), and vacuum must
reclaim exactly the pre-compaction files while the latest version stays
readable.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from crawler_ray.sources import lance_layout as ll


def _seed_store(root: str, n_frags: int = 8, rows_each: int = 25) -> pa.Table:
    """A store table split into many small fragments, incl. a binary
    payload column (the image-bytes shape compaction must carry through
    untouched)."""
    frags = []
    parts = []
    for i in range(n_frags):
        ids = np.arange(i * rows_each, (i + 1) * rows_each, dtype=np.int64)
        t = pa.table({
            "image_id": pa.array([f"img-{v:06d}" for v in ids]),
            "seq": pa.array(ids, pa.int64()),
            "bytes": pa.array([bytes([v % 251]) * (17 + v % 13) for v in ids],
                              pa.binary()),
        })
        frags += ll.write_table_fragment(t, root, "store", f"w{i:02d}")
        parts.append(t)
    ll.write_manifest(root, 1, {"tables": {"store": frags}})
    return pa.concat_tables(parts)


def _read_latest(root: str) -> pa.Table:
    m = ll.latest_manifest(root)
    return ll.read_fragments(root, "store", m["tables"]["store"])


def test_plan_contiguous_and_flush_rules():
    frags = [{"fragment": f"f{i}", "rows": r}
             for i, r in enumerate([25, 25, 25, 90, 10, 25])]
    bins = ll.plan_compaction(frags, target_rows=60)
    # contiguity: concatenation of bins == original order
    flat = [f["fragment"] for b in bins for f in b]
    assert flat == [f["fragment"] for f in frags]
    # a bin never exceeds target unless a single fragment does; flush at >= target
    assert [[f["rows"] for f in b] for b in bins] == [[25, 25], [25], [90], [10, 25]]


def test_compact_preserves_rows_and_order(tmp_path, ray_session):
    root = str(tmp_path / "store_root")
    expect = _seed_store(root)
    stats = ll.compact_table(root, "store", target_rows=60)
    assert stats["version"] == 2
    assert stats["n_after"] < stats["n_before"] == 8
    got = _read_latest(root)
    assert got.equals(expect)  # bit-identical, logical order preserved


def test_compact_idempotent_and_retry_safe(tmp_path, ray_session):
    root = str(tmp_path / "store_root")
    _seed_store(root)
    s1 = ll.compact_table(root, "store", target_rows=60)
    names1 = sorted(f["fragment"] for f in ll.latest_manifest(root)["tables"]["store"])
    # second run: every bin is a singleton -> nothing rewritten, no new version
    s2 = ll.compact_table(root, "store", target_rows=60)
    assert s2["n_rewritten"] == 0 and s2["version"] == s1["version"]
    assert sorted(f["fragment"] for f in ll.latest_manifest(root)["tables"]["store"]) == names1


def test_kill_between_rewrite_and_publish_is_invisible(tmp_path, ray_session):
    """Simulate a kill after the distributed rewrites but before the
    manifest publish: the new files exist but no manifest references them
    -> readers still see v1 bit-identically; a re-run converges to the
    same fragment names (content-derived) and publishes."""
    root = str(tmp_path / "store_root")
    expect = _seed_store(root)
    m = ll.latest_manifest(root)
    bins = ll.plan_compaction(m["tables"]["store"], 60)
    # run one bin's rewrite by hand, then "crash" (no manifest write)
    comp = ll._BinCompactor(root, "store")
    import json as _json
    batch = pa.table({"bin": [0], "frags": [_json.dumps(bins[0])]})
    orphan = comp(batch)["fragment"][0].as_py()
    assert os.path.exists(os.path.join(root, "store", orphan))
    assert _read_latest(root).equals(expect)  # v1 unaffected
    # full re-run reuses the same content-derived name and publishes
    ll.compact_table(root, "store", target_rows=60)
    published = [f["fragment"] for f in ll.latest_manifest(root)["tables"]["store"]]
    assert orphan in published
    assert _read_latest(root).equals(expect)


def test_vacuum_reclaims_old_files_keeps_latest_readable(tmp_path, ray_session):
    root = str(tmp_path / "store_root")
    expect = _seed_store(root)
    ll.compact_table(root, "store", target_rows=60)
    n_files_before = len([f for f in os.listdir(os.path.join(root, "store"))
                          if f.endswith(".parquet")])
    stats = ll.vacuum_versions(root, ["store"], keep_latest=1)
    assert stats["versions_dropped"] == 1
    assert stats["files_removed"] == 8  # exactly the pre-compaction fragments
    n_files_after = len([f for f in os.listdir(os.path.join(root, "store"))
                         if f.endswith(".parquet")])
    assert n_files_after == n_files_before - 8
    assert _read_latest(root).equals(expect)


def test_compact_skips_when_already_large(tmp_path, ray_session):
    root = str(tmp_path / "store_root")
    _seed_store(root, n_frags=2, rows_each=100)
    s = ll.compact_table(root, "store", target_rows=50)
    assert s["n_rewritten"] == 0  # every fragment already >= target
    assert ll.latest_manifest(root)["version"] == 1


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
