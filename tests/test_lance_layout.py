"""Lance-layout store: manifest versioning, atomicity, sweep, determinism."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from crawler_ray.sources import lance_layout as ll


def _t(n=5, start=0):
    return pa.table({"url_hash": pa.array(range(start, start + n), pa.uint64()),
                     "v": pa.array([f"r{i}" for i in range(n)])})


def test_fragment_write_and_manifest_roundtrip(tmp_path):
    root = str(tmp_path)
    w = ll.FragmentWriter(root, "seen", "w0")
    meta = w(_t())
    frag = meta["fragment"][0].as_py()
    assert os.path.exists(os.path.join(root, "seen", frag))
    ll.write_manifest(root, 0, {"wave": 0, "tables": {"seen": [{"fragment": frag, "rows": 5}]}})
    m = ll.latest_manifest(root)
    assert m["version"] == 0
    back = ll.read_fragments(root, "seen", m["tables"]["seen"])
    assert back.num_rows == 5


def test_deterministic_fragment_names(tmp_path):
    root = str(tmp_path)
    w = ll.FragmentWriter(root, "seen", "w0")
    n1 = w(_t())["fragment"][0].as_py()
    n2 = w(_t())["fragment"][0].as_py()          # same content → same name (idempotent rewrite)
    n3 = w(_t(start=100))["fragment"][0].as_py()  # different content → different name
    assert n1 == n2 and n1 != n3
    assert len(os.listdir(os.path.join(root, "seen"))) == 3  # 2 fragments + _tmp


def test_latest_manifest_picks_highest_version(tmp_path):
    root = str(tmp_path)
    for v in (0, 1, 5, 3):
        ll.write_manifest(root, v, {"wave": v, "tables": {}})
    assert ll.latest_manifest(root)["version"] == 5


def test_sweep_removes_unreferenced(tmp_path):
    root = str(tmp_path)
    w = ll.FragmentWriter(root, "store", "w0")
    frag = w(_t())["fragment"][0].as_py()
    ll.write_manifest(root, 0, {"wave": 0, "tables": {"store": [{"fragment": frag, "rows": 5}]}})
    # crash leftovers
    with open(os.path.join(root, "store", "w1-deadbeef.parquet"), "wb") as f:
        f.write(b"junk")
    os.makedirs(os.path.join(root, "store", "_tmp"), exist_ok=True)
    with open(os.path.join(root, "store", "_tmp", "x.parquet"), "wb") as f:
        f.write(b"junk")
    removed = ll.sweep_unreferenced(root, ["store"])
    assert removed == 2
    assert os.path.exists(os.path.join(root, "store", frag))  # referenced survives


def test_glob_fragments_by_wave_prefix(tmp_path):
    root = str(tmp_path)
    w0 = ll.FragmentWriter(root, "order", "w0")
    w1 = ll.FragmentWriter(root, "order", "w1")
    w0(_t()); w1(_t(start=50)); w1(_t(start=90))
    assert len(ll.glob_fragments(root, "order", "w0")) == 1
    frags = ll.glob_fragments(root, "order", "w1")
    assert len(frags) == 2 and all(f["rows"] == 5 for f in frags)
    assert ll.glob_fragments(root, "order", "w") == []  # prefix must match exactly


def test_empty_batch_writes_nothing(tmp_path):
    root = str(tmp_path)
    w = ll.FragmentWriter(root, "dlq", "w0")
    meta = w(_t(0))
    assert meta.num_rows == 0
    assert not os.path.isdir(os.path.join(root, "dlq")) or not os.listdir(os.path.join(root, "dlq"))
