"""Merge-on-read upsert (lance_layout.merge_insert): matched keys hidden
by deletion-vector sidecars, updates appended, published atomically —
checked against a pandas-simulated upsert, through stacked upserts,
time travel, compaction folding the deletes in, and vacuum accounting."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from crawler_ray.sources import lance_layout as ll


def _seed(root: str, n_frags: int = 4, rows_each: int = 20) -> pd.DataFrame:
    frags = []
    parts = []
    for i in range(n_frags):
        ids = np.arange(i * rows_each, (i + 1) * rows_each, dtype=np.int64)
        t = pa.table({"image_id": pa.array([f"img-{v:04d}" for v in ids]),
                      "caption": pa.array([f"cap {v}" for v in ids]),
                      "v": pa.array(ids, pa.int64())})
        frags += ll.write_table_fragment(t, root, "store", f"w{i}")
        parts.append(t)
    ll.write_manifest(root, 1, {"tables": {"store": frags}})
    return pa.concat_tables(parts).to_pandas()


def _updates_ds(ids: list[int], tag: str):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "image_id": [f"img-{v:04d}" for v in ids],
        "caption": [f"{tag} {v}" for v in ids],
        "v": np.asarray(ids, np.int64) + 1000}))


def _read(root: str) -> pd.DataFrame:
    m = ll.latest_manifest(root)
    return ll.read_fragments(root, "store", m["tables"]["store"]).to_pandas()


def _expect_upsert(base: pd.DataFrame, ids: list[int], tag: str) -> pd.DataFrame:
    keys = {f"img-{v:04d}" for v in ids}
    kept = base[~base["image_id"].isin(keys)]
    upd = pd.DataFrame({"image_id": [f"img-{v:04d}" for v in ids],
                        "caption": [f"{tag} {v}" for v in ids],
                        "v": np.asarray(ids, np.int64) + 1000})
    return pd.concat([kept, upd], ignore_index=True)


def test_upsert_matches_pandas_simulation(tmp_path, ray_session):
    root = str(tmp_path / "s")
    base = _seed(root)
    ids = [3, 25, 26, 77]  # hits fragments 0, 1, 3; fragment 2 untouched
    s = ll.merge_insert(root, "store", _updates_ds(ids, "new"), "image_id")
    assert s["n_deleted"] == 4 and s["n_added"] == 4
    assert s["n_updated_fragments"] == 3
    got = _read(root)
    exp = _expect_upsert(base, ids, "new")
    # logical order: surviving old rows in place, then updates
    assert got["image_id"].tolist() == exp["image_id"].tolist()
    assert got["caption"].tolist() == exp["caption"].tolist()


def test_stacked_upserts_union_dvs_and_time_travel(tmp_path, ray_session):
    root = str(tmp_path / "s")
    base = _seed(root)
    ll.merge_insert(root, "store", _updates_ds([3, 25], "a"), "image_id")
    after_v2 = _read(root)
    # second upsert touches the SAME fragment (key 4) and a prior update
    # row (key 3 now lives in an update fragment)
    ll.merge_insert(root, "store", _updates_ds([4, 3], "b"), "image_id")
    got = _read(root)
    exp = _expect_upsert(_expect_upsert(base, [3, 25], "a"), [4, 3], "b")
    assert got["caption"].tolist() == exp["caption"].tolist()
    # time travel: v2 still reads the pre-second-upsert content
    import json
    with open(os.path.join(ll.manifest_dir(root), "v2.json")) as f:
        m2 = json.load(f)
    tt = ll.read_fragments(root, "store", m2["tables"]["store"]).to_pandas()
    assert tt["caption"].tolist() == after_v2["caption"].tolist()


def test_compaction_folds_deletes(tmp_path, ray_session):
    root = str(tmp_path / "s")
    base = _seed(root)
    ll.merge_insert(root, "store", _updates_ds([0, 1, 2, 21], "n"), "image_id")
    before = _read(root)
    ll.compact_table(root, "store", target_rows=100)
    m = ll.latest_manifest(root)
    assert all("dv" not in f for f in m["tables"]["store"] if f["rows"] >= 100)
    after = _read(root)
    assert after["caption"].tolist() == before["caption"].tolist()
    # physical rows of rewritten fragments exclude deleted rows
    rewritten = [f for f in m["tables"]["store"] if f["fragment"].startswith("compact-")]
    assert rewritten and all("dv" not in f for f in rewritten)


def test_vacuum_keeps_dv_of_latest(tmp_path, ray_session):
    root = str(tmp_path / "s")
    _seed(root)
    ll.merge_insert(root, "store", _updates_ds([3], "n"), "image_id")
    before = _read(root)
    stats = ll.vacuum_versions(root, ["store"], keep_latest=1)
    assert stats["versions_dropped"] == 1
    # v1 referenced only fragments also in v2 -> nothing removable
    assert _read(root)["caption"].tolist() == before["caption"].tolist()


def test_upsert_of_all_new_keys_is_pure_append(tmp_path, ray_session):
    root = str(tmp_path / "s")
    base = _seed(root)
    s = ll.merge_insert(root, "store", _updates_ds([900, 901], "n"), "image_id")
    assert s["n_deleted"] == 0 and s["n_updated_fragments"] == 0
    got = _read(root)
    assert len(got) == len(base) + 2


def test_change_feed_deletes_inserts_and_netting(tmp_path, ray_session):
    """v1→v3 feed: full-preimage deletes for dv growth, inserts from new
    fragments with their CURRENT dv applied — a key upserted in both
    waves nets to its final version only."""
    root = str(tmp_path / "s")
    base = _seed(root)
    ll.merge_insert(root, "store", _updates_ds([3, 25], "a"), "image_id")
    ll.merge_insert(root, "store", _updates_ds([3, 40], "b"), "image_id")
    feed = ll.changes_between(root, "store", 1, 3).to_pandas()
    dels = feed[feed["op"] == "delete"].sort_values("image_id")
    ins = feed[feed["op"] == "insert"].sort_values("image_id")
    assert dels["image_id"].tolist() == ["img-0003", "img-0025", "img-0040"]
    # delete rows carry the ORIGINAL caption (preimage)
    assert dels["caption"].tolist() == ["cap 3", "cap 25", "cap 40"]
    # img-0003 nets to its v3 ("b") version; the intermediate "a" row is gone
    assert ins["image_id"].tolist() == ["img-0003", "img-0025", "img-0040"]
    assert ins["caption"].tolist() == ["b 3", "a 25", "b 40"]


def test_change_feed_refuses_compaction_versions(tmp_path, ray_session):
    root = str(tmp_path / "s")
    _seed(root)
    ll.merge_insert(root, "store", _updates_ds([3], "a"), "image_id")
    ll.compact_table(root, "store", target_rows=100)  # v3, data-preserving
    with pytest.raises(ValueError, match="compaction"):
        ll.changes_between(root, "store", 1, 3)
    # diffing up to the pre-compaction version still works
    feed = ll.changes_between(root, "store", 1, 2).to_pandas()
    assert len(feed) == 2


def test_change_feed_empty_when_nothing_changed(tmp_path, ray_session):
    root = str(tmp_path / "s")
    _seed(root)
    feed = ll.changes_between(root, "store", 1, 1)
    assert feed.count() == 0


def test_change_feed_works_after_compaction_then_upsert(tmp_path, ray_session):
    """Regression: the 'compaction' manifest key must not leak into later
    upsert versions — the feed across POST-compaction upserts works, and
    only the compaction version itself is refused."""
    root = str(tmp_path / "s")
    _seed(root)
    ll.compact_table(root, "store", target_rows=100)          # v2 (compaction)
    ll.merge_insert(root, "store", _updates_ds([3], "a"), "image_id")  # v3
    ll.merge_insert(root, "store", _updates_ds([25], "b"), "image_id")  # v4
    feed = ll.changes_between(root, "store", 2, 4).to_pandas()
    assert sorted(feed.loc[feed["op"] == "delete", "image_id"]) == \
        ["img-0003", "img-0025"]
    with pytest.raises(ValueError, match="compaction"):
        ll.changes_between(root, "store", 1, 4)


def test_identical_reupsert_no_double_listing(tmp_path, ray_session):
    """Regression: resubmitting the identical wave rewrites the same
    content-digest fragment; the manifest must list it ONCE, undamaged."""
    root = str(tmp_path / "s")
    base = _seed(root)
    ll.merge_insert(root, "store", _updates_ds([3], "a"), "image_id")
    ll.merge_insert(root, "store", _updates_ds([3], "a"), "image_id")
    names = [f["fragment"] for f in ll.latest_manifest(root)["tables"]["store"]]
    assert len(names) == len(set(names))
    got = _read(root)
    assert len(got) == len(base)
    assert got.loc[got["image_id"] == "img-0003", "caption"].tolist() == ["a 3"]
    # and the identity diff is empty (no logical change)
    assert ll.changes_between(root, "store", 2, 3).count() == 0


def test_stacked_upsert_stats_count_only_new_deletions(tmp_path, ray_session):
    """Regression: a pure-append wave after a prior dv reports zero
    deletions (prior dv rows are not re-counted)."""
    root = str(tmp_path / "s")
    _seed(root)
    ll.merge_insert(root, "store", _updates_ds([3], "a"), "image_id")
    s = ll.merge_insert(root, "store", _updates_ds([900], "b"), "image_id")
    assert s["n_deleted"] == 0 and s["n_updated_fragments"] == 0


def test_compaction_drops_fully_dead_bins(tmp_path, ray_session):
    """Regression: a bin whose rows are all dv-masked compacts to NOTHING
    (no 0-row fragment, no crash)."""
    import ray.data as rd

    root = str(tmp_path / "s")
    base = _seed(root)  # 4 frags x 20 rows
    ids = list(range(80))
    ll.merge_insert(root, "store", _updates_ds(ids, "all"), "image_id")
    s = ll.compact_table(root, "store", target_rows=30)
    got = _read(root)
    assert len(got) == len(base)
    assert got["caption"].str.startswith("all ").all()
    m = ll.latest_manifest(root)
    assert all(f["rows"] > 0 for f in m["tables"]["store"])


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
