"""Round-5b image-quality wave: variance-of-Laplacian sharpness gate,
MMC4-style interleaved-doc token budgeting, LAION-style caption dedup."""
import numpy as np
import pandas as pd

from crawler_ray.imaging import encode_png, laplacian_var_ppm


def _loop_lap_var(rgb: np.ndarray) -> int:
    """Independent per-pixel double-loop formulation (the golden's rule)."""
    h, w = rgb.shape[:2]
    s = s2 = n = 0
    for i in range(1, h - 1):
        for j in range(1, w - 1):
            def g(a, b):
                return int(rgb[a, b, 0]) + int(rgb[a, b, 1]) + int(rgb[a, b, 2])
            L = 4 * g(i, j) - g(i - 1, j) - g(i + 1, j) - g(i, j - 1) - g(i, j + 1)
            s += L
            s2 += L * L
            n += 1
    return ((n * s2 - s * s) * 10**6) // (n * n) if n else 0


def test_laplacian_var_matches_loop_on_random_images():
    rng = np.random.default_rng(11)
    for _ in range(10):
        h, w = int(rng.integers(3, 24)), int(rng.integers(3, 24))
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert laplacian_var_ppm(rgb) == _loop_lap_var(rgb)


def test_laplacian_var_edge_cases():
    # constant image: zero response everywhere
    assert laplacian_var_ppm(np.full((16, 16, 3), 123, np.uint8)) == 0
    # too small for an interior: defined as 0
    assert laplacian_var_ppm(np.zeros((2, 8, 3), np.uint8)) == 0
    # a checkerboard is the highest-frequency signal: large variance
    y, x = np.mgrid[0:16, 0:16]
    cb = (((y + x) % 2) * 255).astype(np.uint8)[:, :, None].repeat(3, axis=2)
    assert laplacian_var_ppm(cb) > 10**9


def test_blur_lowers_laplacian_variance():
    # box-blurring (2x2 block mean, upsampled back) must strictly reduce
    # the high-frequency response on a noisy image
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    blurred = (rgb.astype(np.int64)
               .reshape(16, 2, 16, 2, 3).mean(axis=(1, 3))
               .repeat(2, axis=0).repeat(2, axis=1)).astype(np.uint8)
    assert laplacian_var_ppm(blurred) < laplacian_var_ppm(rgb)


def test_sharpness_query_invariants():
    from __ray_entry__ import SHARP_MIN_VAR_PPM, _image_sharpness

    out = _image_sharpness("unused")
    assert out["image_id"].is_unique and len(out) > 0
    assert ((out["lap_var_ppm"] >= SHARP_MIN_VAR_PPM).astype(np.int64)
            == out["sharp"]).all()
    # the threshold must actually split the fixture
    assert 0 < out["sharp"].sum() < len(out)


def test_interleaved_docs_budget_semantics():
    from __ray_entry__ import SEQ_TOKEN_BUDGET, _interleaved_docs

    out = _interleaved_docs("unused")
    assert len(out) > 0 and out["url"].is_unique
    # hard budget: every assembled sequence fits
    assert (out["total_tokens"] <= SEQ_TOKEN_BUDGET).all()
    assert (out["total_tokens"]
            == out["text_tokens"] + out["image_tokens"]).all()
    assert (out["n_kept"] <= out["n_images"]).all()
    # the budget must bite on some pages and admit everything on others
    assert (out["n_kept"] < out["n_images"]).any()
    assert (out["n_kept"] == out["n_images"]).any()


def test_caption_dedup_conservation():
    import __ray_entry__ as e

    out = e._caption_dedup("unused")
    store = e._crawl_table("store")("unused").to_pandas()
    assert out["n_images"].sum() == len(store)
    # global first-wins: kept count == number of distinct captions
    assert out["n_kept"].sum() == store["caption"].nunique()
    assert (out["n_dropped"] == out["n_images"] - out["n_kept"]).all()
