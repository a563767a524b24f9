"""Cross-corpus (incremental) image dedup: planted-pair kernel checks and
the store query vs its committed golden."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawler_ray.pipelines.multimodal import cross_corpus_phash_dups


def _feats():
    # ref corpus: r0 (h=0), r1 (h=0xFF); new increment: n0 ≈ r0 (ham 2),
    # n1 ≈ n2 (ham 0, SAME side — must NOT pair), n3 far from everything
    return pd.DataFrame({
        "image_id": ["r0", "r1", "n0", "n1", "n2", "n3"],
        "phash": np.array([0x0, 0xFF, 0x3, 0xF0F0, 0xF0F0, -1], np.int64),
    })


def _make_side():
    # defined per-call as a closure so cloudpickle ships it BY VALUE (a
    # module-level test function would pickle by reference to a module the
    # Ray workers cannot import)
    def side(b: pd.DataFrame) -> np.ndarray:
        return b["image_id"].str.startswith("n").to_numpy().astype(np.int8)
    return side


def test_cross_pairs_planted(ray_session):
    out = cross_corpus_phash_dups(_feats(), _make_side(), max_hamming=6)
    # only new×ref pairs within radius: n0↔r0 (ham 2) and n0↔r1
    # (0x3^0xFF = 0xFC → ham 6); the identical SAME-side pair n1/n2 is
    # excluded by construction
    assert list(out["new_id"]) == ["n0", "n0"]
    assert list(out["ref_id"]) == ["r0", "r1"]
    assert list(out["hamming"]) == [2, 6]


def test_cross_pairs_radius_boundary(ray_session):
    f = pd.DataFrame({"image_id": ["rA", "nB"],
                      "phash": np.array([0, 0b1111111], np.int64)})  # ham 7
    assert len(cross_corpus_phash_dups(f, _make_side(), max_hamming=6)) == 0
    out7 = cross_corpus_phash_dups(f, _make_side(), max_hamming=7)
    assert list(out7["hamming"]) == [7]


def test_one_sided_corpus_yields_nothing(ray_session):
    f = pd.DataFrame({"image_id": ["nA", "nB"],
                      "phash": np.array([5, 5], np.int64)})
    assert len(cross_corpus_phash_dups(f, _make_side())) == 0


def test_image_increment_dups_matches_golden(ray_session):
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    got = e.queries()["image_increment_dups"]("/root/testdata/sf0.01")
    golden = pq.read_table("/root/repo/golden/image_increment_dups.parquet").to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), golden)


def test_hot_bucket_chunked_equals_whole(monkeypatch):
    """ADVICE r05: a degenerate hot bucket must not allocate one dense
    |new|x|ref| grid — pin that the chunked slices produce exactly the
    pairs a single-shot meshgrid would (tiny chunk vs. huge chunk)."""
    import numpy as np
    import pandas as pd

    from crawler_ray.functions import dedup_ops as d

    rng = np.random.default_rng(5)
    n = 300
    base = rng.integers(0, 2**63, n)
    # many shared phashes across sides -> a genuinely hot bucket
    g = pd.DataFrame({
        "image_id": [f"i{j}" for j in range(n)],
        "phash": np.where(rng.random(n) < 0.4, base[0], base).astype(np.int64),
        "side": (np.arange(n) % 2).astype(np.int8),
    })
    whole = d.cross_hamming_bucket_pairs(g, max_hamming=6)
    monkeypatch.setattr(d, "CROSS_HAMMING_CHUNK", 7)
    chunked = d.cross_hamming_bucket_pairs(g, max_hamming=6)
    key = ["new_id", "ref_id"]
    pd.testing.assert_frame_equal(
        whole.sort_values(key).reset_index(drop=True),
        chunked.sort_values(key).reset_index(drop=True))
    assert len(whole) > 100
