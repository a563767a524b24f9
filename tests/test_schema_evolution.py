"""Schema evolution (lance_layout.add_column): metadata-only column adds
with backfill-on-read — no fragment rewrites, time travel intact, new
writes carry the column physically, compaction preserves reconciliation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from crawler_ray.sources import lance_layout as ll


def _seed(root: str) -> pd.DataFrame:
    frags = []
    parts = []
    for i in range(3):
        ids = np.arange(i * 10, (i + 1) * 10, dtype=np.int64)
        t = pa.table({"k": pa.array([f"k{v:03d}" for v in ids]),
                      "v": pa.array(ids, pa.int64())})
        frags += ll.write_table_fragment(t, root, "store", f"w{i}")
        parts.append(t)
    ll.write_manifest(root, 1, {"tables": {"store": frags}})
    return pa.concat_tables(parts).to_pandas()


def test_add_column_is_metadata_only_and_backfills(tmp_path):
    import os

    root = str(tmp_path / "s")
    base = _seed(root)
    files_before = {(f, os.stat(os.path.join(root, "store", f)).st_mtime_ns)
                    for f in os.listdir(os.path.join(root, "store"))
                    if f.endswith(".parquet")}
    s = ll.add_column(root, "store", "quality", "int64", default=0)
    assert s["version"] == 2
    # no fragment file touched (name AND mtime_ns identical)
    files_after = {(f, os.stat(os.path.join(root, "store", f)).st_mtime_ns)
                   for f in os.listdir(os.path.join(root, "store"))
                   if f.endswith(".parquet")}
    assert files_after == files_before
    got = ll.read_table(root, "store").to_pandas()
    assert got["quality"].tolist() == [0] * len(base)
    # time travel: v1 has no such column
    v1 = ll.read_table(root, "store", version=1)
    assert "quality" not in v1.column_names


def test_new_writes_carry_column_old_backfill(tmp_path, ray_session):
    import ray.data as rd

    root = str(tmp_path / "s")
    _seed(root)
    ll.add_column(root, "store", "quality", "int64", default=-1)
    upd = pd.DataFrame({"k": ["k005", "k900"], "v": np.array([50, 900], np.int64),
                        "quality": np.array([7, 9], np.int64)})
    ll.merge_insert(root, "store", rd.from_pandas(upd), "k")
    got = ll.read_table(root, "store").to_pandas()
    assert got.loc[got["k"] == "k005", "quality"].tolist() == [7]
    assert got.loc[got["k"] == "k900", "quality"].tolist() == [9]
    assert (got.loc[~got["k"].isin(["k005", "k900"]), "quality"] == -1).all()


def test_compaction_preserves_added_columns(tmp_path, ray_session):
    root = str(tmp_path / "s")
    _seed(root)
    ll.add_column(root, "store", "lang", "string", default="en")
    before = ll.read_table(root, "store").to_pandas()
    ll.compact_table(root, "store", target_rows=25)
    after = ll.read_table(root, "store").to_pandas()
    assert after["lang"].tolist() == before["lang"].tolist()


def test_compacting_mixed_pre_and_post_add_bin_materializes_default(
        tmp_path, ray_session):
    """A bin mixing a pre-add fragment and a post-add physical carrier
    must rewrite the pre-add rows with the DEFAULT, not nulls (regression:
    schema-promote concat null-fills)."""
    import ray.data as rd

    root = str(tmp_path / "s")
    _seed(root)  # 3 fragments of 10, no 'quality'
    ll.add_column(root, "store", "quality", "int64", default=5)
    upd = pd.DataFrame({"k": ["k900", "k901"], "v": np.array([900, 901], np.int64),
                        "quality": np.array([7, 9], np.int64)})
    ll.merge_insert(root, "store", rd.from_pandas(upd), "k")
    before = ll.read_table(root, "store").to_pandas()
    ll.compact_table(root, "store", target_rows=100)  # one bin: all frags
    after = ll.read_table(root, "store").to_pandas()
    assert after["quality"].tolist() == before["quality"].tolist()
    assert after["quality"].tolist() == [5] * 30 + [7, 9]
    # and it is physical now, not reconciliation
    m = ll.latest_manifest(root)
    raw = ll.read_fragments(root, "store", m["tables"]["store"])
    assert raw["quality"].null_count == 0


def test_null_default_and_duplicate_and_bad_type_rejected(tmp_path):
    root = str(tmp_path / "s")
    _seed(root)
    ll.add_column(root, "store", "score", "float64")  # default None -> nulls
    got = ll.read_table(root, "store")
    assert got["score"].null_count == got.num_rows
    with pytest.raises(ValueError, match="already added"):
        ll.add_column(root, "store", "score", "float64")
    with pytest.raises(ValueError, match="unsupported type"):
        ll.add_column(root, "store", "x", "decimal128")


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
