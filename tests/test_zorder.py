"""Z-order clustered layout + min/max fragment pruning
(functions/zorder.py): the Morton kernel vs a bit-by-bit loop, pruning
correctness (pruned scan == full filter, any box), pruning effectiveness
(>half the fragments skipped for a selective box on BOTH dimensions —
the property a 1-D sort layout cannot give), stat honesty, and layout
invariance of the fragment set."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from crawler_ray.functions import zorder


def test_morton_kernel_vs_loop():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 2**16, 500).astype(np.uint64)
    y = rng.integers(0, 2**16, 500).astype(np.uint64)
    got = zorder.morton2(x, y)

    def loop(a: int, b: int) -> int:
        out = 0
        for i in range(16):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    expect = np.array([loop(int(a), int(b)) for a, b in zip(x, y)], np.uint64)
    assert (got == expect).all()


def test_quantize_monotone_and_clipped():
    v = np.array([-5.0, 0.0, 25.0, 50.0, 99.0])
    g = zorder.quantize(v, 0.0, 50.0, bits=8)
    assert (np.diff(g.astype(np.int64)) >= 0).all()
    assert g[0] == 0 and g[-1] == 255


def _layout(tmp_path, ray_session, n=4000, seed=11):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "qty": rng.uniform(1.0, 50.0, n).round(1),
        "disc": rng.uniform(0.0, 0.1, n).round(3),
    })
    root = str(tmp_path / "zroot")
    frags = zorder.write_zorder_layout(
        rd.from_pandas(df), root, "t", "qty", "disc",
        x_range=(1.0, 50.0), y_range=(0.0, 0.1))
    return df, root, frags


def test_pruned_scan_equals_full_filter(tmp_path, ray_session):
    df, root, frags = _layout(tmp_path, ray_session)
    for box in [(10, 20, 0.02, 0.06), (1, 50, 0.0, 0.1), (49.9, 50, 0.0, 0.001),
                (60, 70, 0.2, 0.3)]:  # incl. everything and nothing
        ds, n_total, n_read = zorder.bbox_scan(root, "t", "qty", "disc", *box)
        got = ds.to_pandas()
        m = (df["qty"].between(box[0], box[1])
             & df["disc"].between(box[2], box[3]))
        exp = df.loc[m].sort_values("rid").reset_index(drop=True)
        if len(exp) == 0:
            # Ray drops the schema on fully-empty results; rows agreeing
            # at zero is the contract here
            assert len(got) == 0, box
        else:
            assert sorted(got["rid"].tolist()) == exp["rid"].tolist(), box
        assert n_read <= n_total


def test_pruning_effective_on_both_dims(tmp_path, ray_session):
    """A box selective in BOTH dimensions must skip more than half the
    fragments — the Z-curve property (a layout sorted only by qty could
    not prune on disc)."""
    _, root, frags = _layout(tmp_path, ray_session)
    _, n_total, n_read = zorder.bbox_scan(root, "t", "qty", "disc",
                                          10.0, 20.0, 0.02, 0.06)
    assert n_total == len(frags) and n_total >= 16
    assert n_read < n_total / 2, (n_read, n_total)


def test_fragment_stats_honest(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from crawler_ray.sources import lance_layout as ll

    _, root, frags = _layout(tmp_path, ray_session)
    for f in frags[:5]:
        t = pq.read_table(ll.fragment_paths(root, "t", [f])[0])
        q = t["qty"].to_numpy()
        d = t["disc"].to_numpy()
        s = f["stats"]
        assert s["min_x"] == q.min() and s["max_x"] == q.max()
        assert s["min_y"] == d.min() and s["max_y"] == d.max()


def test_fragment_set_layout_invariant(tmp_path, ray_session):
    """Bucket membership is a pure row function: re-clustering the same
    rows from a different block layout yields the identical fragment
    names (content-digest) and stats."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "rid": np.arange(1000, dtype=np.int64),
        "qty": rng.uniform(1.0, 50.0, 1000).round(1),
        "disc": rng.uniform(0.0, 0.1, 1000).round(3),
    })
    names = []
    for nb in (2, 17):
        root = str(tmp_path / f"zroot{nb}")
        frags = zorder.write_zorder_layout(
            rd.from_pandas(df).repartition(nb), root, "t", "qty", "disc",
            x_range=(1.0, 50.0), y_range=(0.0, 0.1))
        names.append(sorted(f["fragment"] for f in frags))
    assert names[0] == names[1]


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
