"""WDS tar-shard export at bench-store scale.

Exports the sf0.1 bench crawl store (~31k images, ~7.5 GB of PNG bytes)
through the full sink chain — parquet shard stage+finalize, then the
deterministic ustar tar layer — and validates the result three ways:
manifest totals vs store rows, a pread spot-check of random samples via
the byte-offset index (the StreamingDataset access pattern), and stdlib
tarfile re-reading one full shard. Prints one JSON line per stage.

Run (machine otherwise idle; see BENCH/BASELINE.md noise discipline):
    python tools/wds_scale_demo.py [store_root] [n_shards]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import ray  # noqa: E402


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/crawler_ray_bench_2"
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    out = "/tmp/crawler_ray_wds_demo"
    shutil.rmtree(out, ignore_errors=True)

    from crawler_ray.pipelines.export import (
        export_training_shards,
        export_wds_shards,
        read_training_shards,
    )

    t0 = time.time()
    pq_manifest = export_training_shards(root, out, n_shards=n_shards)
    t1 = time.time()
    wds_manifest = export_wds_shards(root, out, n_shards=n_shards)
    t2 = time.time()

    n_pairs = int(pq_manifest["n_pairs"].sum())
    tar_bytes_total = sum(os.path.getsize(os.path.join(out, f"shard-{s}.tar"))
                          for s in range(n_shards))
    print(json.dumps({
        "stage": "wds_export", "store_root": root, "n_shards": n_shards,
        "n_pairs": n_pairs,
        "n_dups_dropped": int(pq_manifest["n_dups_dropped"].sum()),
        "tar_gb": round(tar_bytes_total / 2**30, 2),
        "parquet_stage_sec": round(t1 - t0, 1),
        "tar_stage_sec": round(t2 - t1, 1),
        "tar_mb_per_sec": round(tar_bytes_total / 2**20 / (t2 - t1), 1),
    }))

    # resume is a manifest no-op at this scale too
    t3 = time.time()
    again = export_wds_shards(root, out, n_shards=n_shards)
    assert again.equals(wds_manifest)
    print(json.dumps({"stage": "wds_resume_noop",
                      "sec": round(time.time() - t3, 2)}))

    # pread spot-check: 64 random samples fetched by byte offset must equal
    # the parquet layer's bytes (no full-shard read)
    from crawler_ray.sources.wds_tar import iter_ustar_index

    pqb = (read_training_shards(out).to_pandas()
           .set_index("image_id")["bytes"])
    rng = np.random.default_rng(7)
    idx_all = []
    for s in range(n_shards):
        path = os.path.join(out, f"shard-{s}.tar")
        with open(path, "rb") as f:
            data = f.read()
        idx_all.extend((path, n, off, size)
                       for n, off, size in iter_ustar_index(data)
                       if n.endswith(".png"))
    assert len(idx_all) == n_pairs
    picks = rng.choice(len(idx_all), size=64, replace=False)
    for k in picks:
        path, name, off, size = idx_all[int(k)]
        with open(path, "rb") as f:
            f.seek(off)
            got = f.read(size)
        assert got == pqb.loc[name[:-4]], f"pread mismatch for {name}"
    print(json.dumps({"stage": "wds_pread_spotcheck", "samples": 64,
                      "index_members": len(idx_all), "ok": True}))

    # stdlib tarfile reads a full shard (format interop at scale)
    import io
    import tarfile

    biggest = max(range(n_shards),
                  key=lambda s: os.path.getsize(os.path.join(out, f"shard-{s}.tar")))
    with open(os.path.join(out, f"shard-{biggest}.tar"), "rb") as f:
        with tarfile.open(fileobj=io.BytesIO(f.read())) as tf:
            names = tf.getnames()
    print(json.dumps({"stage": "wds_stdlib_interop", "shard": biggest,
                      "members": len(names), "ok": len(names) % 2 == 0}))
    ray.shutdown()


if __name__ == "__main__":
    main()
