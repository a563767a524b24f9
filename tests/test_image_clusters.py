"""image_dup_clusters — connected components over banded phash pairs,
vs the committed union-find golden and a synthetic transitive chain."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
import __ray_entry__ as e


def test_matches_union_find_golden(ray_session):
    got = e.queries()["image_dup_clusters"]("/root/testdata/sf0.01")
    golden = pq.read_table("/root/repo/golden/image_dup_clusters.parquet").to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), golden)


def test_transitive_chain_and_singletons(ray_session, monkeypatch):
    """a-b and b-c must merge into one cluster of 3 labeled by min id;
    an isolated pair forms its own cluster; pair-less images never appear."""
    pairs = pd.DataFrame({
        "image_a": ["img_b", "img_a", "img_x"],
        "image_b": ["img_c", "img_b", "img_y"],
        "hamming": np.array([1, 2, 3], np.int32)})
    monkeypatch.setattr(e, "_phash_dups", lambda sf: pairs)
    out = e._image_dup_clusters("unused")
    exp = pd.DataFrame({
        "image_id": ["img_a", "img_b", "img_c", "img_x", "img_y"],
        "rep_image": ["img_a", "img_a", "img_a", "img_x", "img_x"],
        "cluster_size": np.array([3, 3, 3, 2, 2], np.int64)})
    pd.testing.assert_frame_equal(out, exp)


def test_empty_pairs(ray_session, monkeypatch):
    empty = pd.DataFrame({"image_a": pd.Series([], dtype=str),
                          "image_b": pd.Series([], dtype=str),
                          "hamming": pd.Series([], dtype=np.int32)})
    monkeypatch.setattr(e, "_phash_dups", lambda sf: empty)
    out = e._image_dup_clusters("unused")
    assert len(out) == 0
    assert list(out.columns) == ["image_id", "rep_image", "cluster_size"]
