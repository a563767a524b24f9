"""Training-shard export: dedup rule, shard co-location, resume skip."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from crawler_ray.pipelines.export import export_training_shards, shard_of
from crawler_ray.sources import lance_layout as ll

N_SHARDS = 4


@pytest.fixture()
def store_root(tmp_path):
    """A fake store with planted phash duplicates: ids d0/d1/d2 share
    phash 77 (d0 must win), e0/e1 share phash -5 (e0 must win)."""
    rows = []
    for i in range(40):
        rows.append(dict(image_id=f"img{i:03d}", bytes=b"\x89PNG" + bytes([i]),
                         w=np.int32(8), h=np.int32(8), fmt="png",
                         caption=f"cap {i}", phash=np.int64(1000 + i)))
    for j, (iid, ph) in enumerate([("d0", 77), ("d1", 77), ("d2", 77),
                                   ("e0", -5), ("e1", -5)]):
        rows.append(dict(image_id=iid, bytes=b"dup" + bytes([j]),
                         w=np.int32(8), h=np.int32(8), fmt="png",
                         caption="dup", phash=np.int64(ph)))
    t = pa.Table.from_pylist(rows)
    root = str(tmp_path / "store_root")
    frags = (ll.write_table_fragment(t[:20], root, "store", "w0")
             + ll.write_table_fragment(t[20:], root, "store", "w0"))
    ll.write_manifest(root, 0, {"wave": 0, "tables": {"store": frags}})
    return root, pd.DataFrame(rows)


def test_export_dedups_and_colocates(ray_session, store_root, tmp_path):
    root, df = store_root
    out = str(tmp_path / "export")
    stats = export_training_shards(root, out, n_shards=N_SHARDS)
    assert int(stats["n_dups_dropped"].sum()) == 3  # d1,d2,e1 dropped
    assert int(stats["n_pairs"].sum()) == 42

    seen = {}
    for s in range(N_SHARDS):
        p = os.path.join(out, f"shard-{s}.parquet")
        t = pd.read_parquet(p)
        # every row landed in its hash shard; file sorted by image_id
        assert (shard_of(t["phash"].to_numpy(), N_SHARDS) == s).all()
        assert list(t["image_id"]) == sorted(t["image_id"])
        assert not t["phash"].duplicated().any()
        for r in t.itertuples(index=False):
            seen[r.phash] = r.image_id
    # first-wins by min image_id, and dup bytes follow the winner
    assert seen[77] == "d0" and seen[-5] == "e0"
    assert len(seen) == 42
    # staging cleaned up after finalize (absent or empty)
    staging = os.path.join(out, "staging")
    assert not os.path.isdir(staging) or not any(os.scandir(staging))


def test_export_resume_skips_done_shards(ray_session, store_root, tmp_path):
    root, _ = store_root
    out = str(tmp_path / "export")
    first = export_training_shards(root, out, n_shards=N_SHARDS)
    inodes = {s: os.stat(os.path.join(out, f"shard-{s}.parquet")).st_ino
              for s in range(N_SHARDS)}

    # full re-run: manifest says all done → byte-identical stats, files untouched
    again = export_training_shards(root, out, n_shards=N_SHARDS)
    assert again.equals(first)
    for s in range(N_SHARDS):
        assert os.stat(os.path.join(out, f"shard-{s}.parquet")).st_ino == inodes[s]

    # kill one shard: only that one is rebuilt, stats converge
    os.remove(os.path.join(out, "shard-2.parquet"))
    resumed = export_training_shards(root, out, n_shards=N_SHARDS)
    assert resumed.equals(first)
    for s in range(N_SHARDS):
        same = os.stat(os.path.join(out, f"shard-{s}.parquet")).st_ino == inodes[s]
        assert same == (s != 2)
    m = json.load(open(os.path.join(out, "_manifest.json")))
    assert sorted(m["shards"]) == [str(s) for s in range(N_SHARDS)]

    # resuming with a different modulus would break dup co-location: refuse
    with pytest.raises(ValueError, match="n_shards"):
        export_training_shards(root, out, n_shards=N_SHARDS * 2)


def test_read_training_shards_roundtrip(ray_session, store_root, tmp_path):
    from crawler_ray.pipelines.export import read_training_shards

    root, df = store_root
    out = str(tmp_path / "export")
    stats = export_training_shards(root, out, n_shards=N_SHARDS)
    back = read_training_shards(out).to_pandas()
    assert len(back) == int(stats["n_pairs"].sum()) == 42
    assert set(back.columns) == {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"}
    # the winning duplicate's bytes round-trip intact
    assert back.loc[back["image_id"] == "d0", "bytes"].iloc[0] == b"dup\x00"
    with pytest.raises(ValueError, match="not in manifest"):
        read_training_shards(out, shards=[N_SHARDS + 3])


def test_jsonl_export_resume_and_roundtrip(ray_session, store_root, tmp_path):
    from crawler_ray.pipelines.export import export_jsonl_shards, read_jsonl_shards

    root, _ = store_root
    out = str(tmp_path / "export")
    first = export_jsonl_shards(root, out, n_shards=N_SHARDS)
    assert list(first.columns) == ["shard", "n_rows", "digest"]
    assert int(first["n_rows"].sum()) == 42

    # each line is canonical json with the fixed key order, no bytes column
    with open(os.path.join(out, "shard-0.jsonl"), "rb") as f:
        line = json.loads(f.readline())
    assert sorted(line) == ["caption", "fmt", "h", "image_id", "phash", "w"]

    # full re-run = manifest no-op; killing one file rebuilds only it.
    # "skipped" is evidenced by (inode, mtime_ns) both surviving — a bare
    # inode compare is flaky because the fs may hand the deleted shard's
    # freed inode straight back to its replacement.
    def _sig(s):
        st = os.stat(os.path.join(out, f"shard-{s}.jsonl"))
        return (st.st_ino, st.st_mtime_ns)

    sigs = {s: _sig(s) for s in range(N_SHARDS)}
    again = export_jsonl_shards(root, out, n_shards=N_SHARDS)
    assert again.equals(first)
    assert all(_sig(s) == sigs[s] for s in range(N_SHARDS))
    os.remove(os.path.join(out, "shard-1.jsonl"))
    resumed = export_jsonl_shards(root, out, n_shards=N_SHARDS)
    assert resumed.equals(first)
    for s in range(N_SHARDS):
        if s == 1:
            assert os.path.exists(os.path.join(out, f"shard-{s}.jsonl"))
        else:
            assert _sig(s) == sigs[s]

    back = read_jsonl_shards(out).to_pandas()
    assert len(back) == 42
    assert set(back.columns) == {"caption", "fmt", "h", "image_id", "phash", "w"}
    # the deduped winner appears exactly once with its signed phash intact
    d0 = back.loc[back["image_id"] == "d0"]
    assert len(d0) == 1 and int(back.loc[back["image_id"] == "e0", "phash"].iloc[0]) == -5

    with pytest.raises(ValueError, match="n_shards"):
        export_jsonl_shards(root, out, n_shards=N_SHARDS * 2)


def test_ustar_writer_matches_stdlib_tarfile_and_rejects_corruption():
    import io
    import tarfile

    from crawler_ray.sources.wds_tar import parse_ustar, tar_bytes, ustar_member

    members = [("a0.png", b"\x89PNG fake"), ("a0.json", b'{"k":1}'),
               ("big.bin", b"x" * 1200), ("empty.json", b"")]
    mine = tar_bytes(members)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for n, d in members:
            ti = tarfile.TarInfo(n)
            ti.size = len(d)
            ti.mtime = 0
            ti.uid = ti.gid = 0
            ti.uname = ti.gname = ""
            ti.mode = 0o644
            tf.addfile(ti, io.BytesIO(d))
    assert mine == buf.getvalue()  # byte-identical to the stdlib writer
    assert parse_ustar(mine) == members
    # stdlib can read our archive too
    with tarfile.open(fileobj=io.BytesIO(mine)) as tf:
        assert tf.getnames() == [n for n, _ in members]
    # a flipped byte inside a header fails the stored checksum loudly
    corrupt = bytearray(mine)
    corrupt[1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum|magic"):
        parse_ustar(bytes(corrupt))
    with pytest.raises(ValueError, match="too long"):
        ustar_member("n" * 101, b"")
    # truncated copies must fail, never parse as a shorter valid shard
    with pytest.raises(ValueError, match="truncated"):
        parse_ustar(mine[:512 + 100])       # member data cut short
    with pytest.raises(ValueError, match="truncated"):
        parse_ustar(mine.rstrip(b"\0"))     # end-of-archive marker gone
    # the 12-byte octal size field tops out below 8 GiB: guard, don't
    # silently resize the header (checked via a len-only stand-in)
    fake_big = type("Big", (), {"__len__": lambda self: 8**11})()
    with pytest.raises(ValueError, match="too large"):
        ustar_member("big.bin", fake_big)


def test_wds_export_resume_and_roundtrip(ray_session, store_root, tmp_path):
    from crawler_ray.pipelines.export import (
        export_wds_shards,
        read_training_shards,
        read_wds_shards,
    )

    root, _ = store_root
    out = str(tmp_path / "export")
    first = export_wds_shards(root, out, n_shards=N_SHARDS)
    assert list(first.columns) == ["shard", "n_samples", "digest"]
    assert int(first["n_samples"].sum()) == 42

    # resume: full re-run is a manifest no-op; a deleted tar is rebuilt
    # with identical bytes (digest pinned by the manifest)
    again = export_wds_shards(root, out, n_shards=N_SHARDS)
    assert again.equals(first)
    os.remove(os.path.join(out, "shard-1.tar"))
    resumed = export_wds_shards(root, out, n_shards=N_SHARDS)
    assert resumed.equals(first)

    back = read_wds_shards(out).to_pandas().sort_values("image_id")
    assert len(back) == 42
    pqb = (read_training_shards(out).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    assert back["image_id"].tolist() == pqb["image_id"].tolist()
    assert (back["bytes"].to_numpy() == pqb["bytes"].to_numpy()).all()
    assert int(back.loc[back["image_id"] == "e0", "phash"].iloc[0]) == -5

    with pytest.raises(ValueError, match="n_shards"):
        export_wds_shards(root, out, n_shards=N_SHARDS * 2)


def test_ustar_index_offsets_support_pread():
    import io
    import tarfile

    from crawler_ray.sources.wds_tar import iter_ustar_index, tar_bytes

    members = [("s0.png", b"\x89PNG" + bytes(range(100))), ("s0.json", b"{}"),
               ("s1.png", b"Q" * 511)]
    arch = tar_bytes(members)
    idx = iter_ustar_index(arch)
    assert [(n, s) for n, _, s in idx] == [(n, len(d)) for n, d in members]
    # offsets recover exact member bytes (what a pread-based loader does)
    for (name, off, size), (_, data) in zip(idx, members):
        assert arch[off:off + size] == data
    # and agree with stdlib tarfile's offset_data on the same archive
    with tarfile.open(fileobj=io.BytesIO(arch)) as tf:
        for ti, (_, off, size) in zip(tf.getmembers(), idx):
            assert (ti.offset_data, ti.size) == (off, size)


def test_ustar_roundtrip_hypothesis_fuzz():
    import io
    import tarfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawler_ray.sources.wds_tar import parse_ustar, tar_bytes

    names = st.text(
        alphabet=st.characters(whitelist_categories=("L", "N"),
                               whitelist_characters="._-"),
        min_size=1, max_size=24)
    member = st.tuples(names, st.binary(min_size=0, max_size=2000))

    @settings(max_examples=60, deadline=None)
    @given(st.lists(member, min_size=0, max_size=8,
                    unique_by=lambda m: m[0]))
    def roundtrip(members):
        arch = tar_bytes(members)
        assert parse_ustar(arch) == members
        assert len(arch) % 10240 == 0
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.USTAR_FORMAT) as tf:
            for n, d in members:
                ti = tarfile.TarInfo(n)
                ti.size = len(d)
                ti.mtime = 0
                ti.uid = ti.gid = 0
                ti.uname = ti.gname = ""
                ti.mode = 0o644
                tf.addfile(ti, io.BytesIO(d))
        assert arch == buf.getvalue()

    roundtrip()


def test_csv_row_quoting_matches_stdlib_writer():
    import csv
    import io

    from crawler_ray.pipelines.export import _csv_field

    # full multi-field rows (the sink's shape): our minimal quoting must be
    # byte-identical to stdlib csv.writer's for every hostile field
    rows = [["plain", "has,comma", 'has"quote'],
            ["has\nnewline", "", "trailing space "],
            ['",\n"', -5, 123],
            ["id0", 'a"b,c', "x\ny"]]
    for row in rows:
        sio = io.StringIO()
        csv.writer(sio, lineterminator="\n").writerow(row)
        assert ",".join(_csv_field(v) for v in row) + "\n" == sio.getvalue()


def test_csv_export_resume_and_roundtrip(ray_session, store_root, tmp_path):
    from crawler_ray.pipelines.export import export_csv_shards, read_csv_shards

    root, _ = store_root
    out = str(tmp_path / "export")
    first = export_csv_shards(root, out, n_shards=N_SHARDS)
    assert list(first.columns) == ["shard", "n_rows", "digest"]
    assert int(first["n_rows"].sum()) == 42

    with open(os.path.join(out, "shard-0.csv")) as f:
        assert f.readline().strip() == "image_id,w,h,fmt,phash,caption"

    again = export_csv_shards(root, out, n_shards=N_SHARDS)
    assert again.equals(first)
    os.remove(os.path.join(out, "shard-1.csv"))
    resumed = export_csv_shards(root, out, n_shards=N_SHARDS)
    assert resumed.equals(first)

    back = read_csv_shards(out).to_pandas()
    assert len(back) == 42
    assert set(back.columns) == {"image_id", "w", "h", "fmt", "phash", "caption"}
    assert int(back.loc[back["image_id"] == "e0", "phash"].iloc[0]) == -5

    with pytest.raises(ValueError, match="n_shards"):
        export_csv_shards(root, out, n_shards=N_SHARDS * 2)


def test_csv_reader_pins_types_and_handles_all_empty(ray_session, tmp_path):
    import json as _json

    from crawler_ray.pipelines.export import CSV_SCHEMA, read_csv_shards

    out = str(tmp_path / "csvs")
    os.makedirs(out)
    # an all-digit-string id column must NOT collapse to int64 (leading zero)
    with open(os.path.join(out, "shard-0.csv"), "w") as f:
        f.write("image_id,w,h,fmt,phash,caption\n0123,8,8,png,-5,cap\n")
    with open(os.path.join(out, "_csv_manifest.json"), "w") as f:
        _json.dump({"n_shards": 1,
                    "shards": {"0": {"n_rows": 1, "digest": "x"}}}, f)
    back = read_csv_shards(out).to_pandas()
    assert back["image_id"].iloc[0] == "0123"
    assert back["phash"].iloc[0] == -5

    # every-shard-empty: empty Dataset with the pinned schema, not a crash
    out2 = str(tmp_path / "empty")
    os.makedirs(out2)
    with open(os.path.join(out2, "shard-0.csv"), "w") as f:
        f.write("image_id,w,h,fmt,phash,caption\n")
    with open(os.path.join(out2, "_csv_manifest.json"), "w") as f:
        _json.dump({"n_shards": 1,
                    "shards": {"0": {"n_rows": 0, "digest": "x"}}}, f)
    ds = read_csv_shards(out2)
    assert ds.count() == 0 and ds.schema().base_schema.equals(CSV_SCHEMA)
