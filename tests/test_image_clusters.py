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


def test_keep_best_matches_golden(ray_session):
    got = e.queries()["image_dedup_keep_best"]("/root/testdata/sf0.01")
    golden = pq.read_table("/root/repo/golden/image_dedup_keep_best.parquet").to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), golden)


def test_keep_best_pixel_argmax_and_ties(ray_session, monkeypatch):
    """Max w*h wins; equal pixel counts fall back to min image_id."""
    import ray.data as rd

    pairs = pd.DataFrame({
        "image_a": ["a1", "a1", "t1"],
        "image_b": ["a2", "a3", "t2"],
        "hamming": np.array([1, 1, 1], np.int32)})
    feats = pd.DataFrame({
        "image_id": ["a1", "a2", "a3", "t1", "t2", "solo"],
        "w": np.array([10, 50, 20, 8, 4, 999], np.int32),
        "h": np.array([10, 40, 20, 2, 4, 999], np.int32)})
    monkeypatch.setattr(e, "_phash_dups", lambda sf: pairs)
    monkeypatch.setattr(e, "_featurized", lambda: rd.from_pandas(feats))
    out = e._image_dedup_keep_best("unused")
    exp = pd.DataFrame({
        "rep_image": ["a1", "t1"],
        "kept_image": ["a2", "t1"],     # a2: 2000 px max; t1 == t2 px, min id
        "kept_pixels": np.array([2000, 16], np.int64),
        "n_dropped": np.array([2, 1], np.int64)})
    pd.testing.assert_frame_equal(out, exp)


def test_empty_pairs(ray_session, monkeypatch):
    empty = pd.DataFrame({"image_a": pd.Series([], dtype=str),
                          "image_b": pd.Series([], dtype=str),
                          "hamming": pd.Series([], dtype=np.int32)})
    monkeypatch.setattr(e, "_phash_dups", lambda sf: empty)
    out = e._image_dup_clusters("unused")
    assert len(out) == 0
    assert list(out.columns) == ["image_id", "rep_image", "cluster_size"]


def test_image_quality_gate_matches_golden(ray_session):
    got = e.queries()["image_quality_gate"]("/root/testdata/sf0.01")
    golden = pq.read_table("/root/repo/golden/image_quality_gate.parquet").to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), golden)
    # the gate discriminates on the fixture (some images fail)
    assert int(got["n_pass"].sum()) < int(got["n_images"].sum())


def test_image_corpus_build_matches_golden(ray_session):
    got = e.queries()["image_corpus_build"]("/root/testdata/sf0.01")
    golden = pq.read_table("/root/repo/golden/image_corpus_build.parquet").to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), golden)
    # the chain actually filters: kept pairs < store size, and caption
    # tokens are consistent with the 16-word fixture captions
    feats = e.queries()["image_features"]("/root/testdata/sf0.01")
    assert int(got["n_pairs"].sum()) < len(feats)
    assert (got["sum_caption_tokens"] == 16 * got["n_pairs"]).all()
