"""Round-5 image training-pipeline kernels: patch-token accounting,
SDXL-style aspect bucketing (integer-exact nearest-log-aspect), and the
CLIP-filter-shaped caption↔image alignment stage."""
import math

import numpy as np
import pandas as pd
import pyarrow as pa

from crawler_ray.imaging import decode_png, encode_png
from crawler_ray.pipelines.multimodal import (
    ASPECT_BUCKETS,
    CAP_DIM,
    TOWER_Q,
    TowerStage,
    aspect_bucket_ids,
    caption_embed,
    embed_rgb,
    patch_tokens,
)
from crawler_ray.hashing import xxh64


def test_patch_tokens_matches_ceil_loop():
    rng = np.random.default_rng(7)
    w = rng.integers(1, 5000, 300)
    h = rng.integers(1, 5000, 300)
    got = patch_tokens(w, h)
    want = [math.ceil(a / 14) * math.ceil(b / 14) for a, b in zip(w, h)]
    assert got.tolist() == want
    assert patch_tokens([14], [14]).tolist() == [1]
    assert patch_tokens([15], [14]).tolist() == [2]


def test_aspect_bucket_matches_log_argmin_on_grid():
    # dense (w, h) sweep: the integer geometric-mean rule must agree with
    # a float log-space argmin everywhere the float answer is unambiguous
    w, h = np.meshgrid(np.arange(32, 200), np.arange(32, 200))
    w, h = w.ravel(), h.ravel()
    got = aspect_bucket_ids(w, h)
    la = np.log(w / h)
    lb = np.array([math.log(bw / bh) for bw, bh in ASPECT_BUCKETS])
    want = np.abs(la[:, None] - lb[None, :]).argmin(axis=1)
    assert (got == want).all()


def test_aspect_bucket_exact_aspect_and_clamps():
    # exact bucket aspect picks that bucket; out-of-range clamps to the ends
    bw, bh = ASPECT_BUCKETS[3]
    assert aspect_bucket_ids([bw // 64], [bh // 64]).tolist() == [3]
    assert aspect_bucket_ids([1], [100]).tolist() == [0]
    assert aspect_bucket_ids([100], [1]).tolist() == [len(ASPECT_BUCKETS) - 1]


def test_aspect_bucket_geometric_tie_picks_lower_index():
    # buckets with aspects 1/2 and 2: geometric mean is exactly 1, so a
    # square image is an exact tie — the rule must keep the smaller index
    buckets = ((512, 1024), (1024, 512))
    assert aspect_bucket_ids([100], [100], buckets=buckets).tolist() == [0]


def test_caption_embed_matches_token_loop_and_handles_empty():
    caps = ["big red house near park", "", None, "a a a b"]
    mat = caption_embed(caps)
    assert mat.shape == (4, CAP_DIM)
    # empty / null captions embed to the zero vector (no NaN from 0-norm)
    assert not mat[1].any() and not mat[2].any()
    for i in (0, 3):
        vec = np.zeros(CAP_DIM)
        for t in caps[i].split():
            vec[int(xxh64(t) % CAP_DIM)] += 1.0
        vec /= np.linalg.norm(vec)
        assert np.array_equal(mat[i], vec)
    # repeated tokens are count-weighted, not set-weighted
    assert mat[3].max() > 0.9


def test_bucket_resize_stage_hits_bucket_targets_and_is_deterministic():
    from crawler_ray.pipelines.multimodal import (
        BUCKET_SCALE_DIV,
        BucketResizeStage,
        resize_rgb,
    )

    rng = np.random.default_rng(5)
    dims = [(64, 48), (48, 96), (96, 48), (80, 80)]
    imgs = [rng.integers(0, 256, (h, w, 3), np.uint8) for w, h in dims]
    batch = pa.table({
        "image_id": pa.array([f"i{k}" for k in range(len(imgs))], pa.string()),
        "bytes": pa.array([encode_png(a) for a in imgs], pa.binary()),
        "w": pa.array([d[0] for d in dims], pa.int32()),
        "h": pa.array([d[1] for d in dims], pa.int32()),
    })
    out = BucketResizeStage()(batch).to_pandas()
    buckets = aspect_bucket_ids([d[0] for d in dims], [d[1] for d in dims])
    for k in range(len(imgs)):
        b = int(buckets[k])
        tw = ASPECT_BUCKETS[b][0] // BUCKET_SCALE_DIV
        th = ASPECT_BUCKETS[b][1] // BUCKET_SCALE_DIV
        assert (out["out_w"].iloc[k], out["out_h"].iloc[k]) == (tw, th)
        # fixture guarantee: bucket targets never upscale (no upscale path)
        assert tw <= dims[k][0] and th <= dims[k][1]
        want = encode_png(resize_rgb(decode_png(encode_png(imgs[k])), th, tw))
        assert out["bytes"].iloc[k] == want
    # re-running the stage is byte-identical (digest-sum check relies on it)
    out2 = BucketResizeStage()(batch).to_pandas()
    assert (out["bytes"] == out2["bytes"]).all()


def test_grouped_packing_matches_running_sum_loop(ray_session):
    import ray.data as rd

    from crawler_ray.functions import scan

    rng = np.random.default_rng(9)
    n = 500
    df = pd.DataFrame({"image_id": [f"im{k:04d}" for k in range(n)],
                       "bucket": rng.integers(0, 4, n),
                       "n_tokens": rng.integers(10, 50, n)})
    ds = rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(7)
    got = scan.grouped_cumulative_sum_ds(
        ds, "bucket", ["image_id"], "n_tokens",
        out_col="tok_before", exclusive=True).to_pandas()
    got["batch_idx"] = got["tok_before"] // 96
    got = got.sort_values("image_id").reset_index(drop=True)
    run: dict = {}
    want = []
    for r in df.sort_values("image_id").itertuples():
        before = run.get(r.bucket, 0)
        run[r.bucket] = before + r.n_tokens
        want.append(before // 96)
    assert got["batch_idx"].tolist() == want


def test_tower_stage_matches_row_loop_and_integer_align():
    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (h, w, 3), np.uint8) for w, h in
            ((64, 48), (80, 80), (48, 96))]
    caps = ["sunny two bed flat", "quiet loft", "garden studio near line"]
    batch = pa.table({
        "image_id": pa.array([f"i{k}" for k in range(3)], pa.string()),
        "bytes": pa.array([encode_png(a) for a in imgs], pa.binary()),
        "w": pa.array([a.shape[1] for a in imgs], pa.int32()),
        "h": pa.array([a.shape[0] for a in imgs], pa.int32()),
        "fmt": pa.array(["png"] * 3, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "host": pa.array(["h1", "h2", "h1"], pa.string()),
    })
    out = TowerStage()(batch).to_pandas()
    assert list(out.columns) == ["image_id", "host", "fmt", "fq", "cq"]
    cv = caption_embed(caps)
    for k in range(3):
        feat = embed_rgb(decode_png(encode_png(imgs[k]))).astype(np.float64)
        fq = [int(np.floor(x * TOWER_Q)) for x in feat]
        cq = [int(np.floor(x * TOWER_Q)) for x in cv[k]]
        assert list(out["fq"].iloc[k]) == fq
        assert list(out["cq"].iloc[k]) == cq
        # the alignment gate's score is the plain integer dot of these
        q = sum(a * b for a, b in zip(fq, cq))
        F = np.asarray(out["fq"].iloc[k], np.int64)
        C = np.asarray(out["cq"].iloc[k], np.int64)
        assert int(F @ C) == q and q >= 0


def test_epoch_shuffle_keys_are_per_epoch_independent():
    from crawler_ray.hashing import xxh64_array
    from crawler_ray.pipelines.export import _mix64

    ids = [f"im{k}" for k in range(200)]
    h = xxh64_array(ids)
    k1 = np.argsort((_mix64(h ^ np.uint64(1)) >> np.uint64(1)).astype(np.int64))
    k2 = np.argsort((_mix64(h ^ np.uint64(2)) >> np.uint64(1)).astype(np.int64))
    assert not np.array_equal(k1, k2)      # epochs reshuffle
    k1b = np.argsort((_mix64(xxh64_array(ids) ^ np.uint64(1))
                      >> np.uint64(1)).astype(np.int64))
    assert np.array_equal(k1, k1b)         # same epoch reproduces exactly


def test_channel_sums_integer_exact_vs_loop():
    rng = np.random.default_rng(13)
    imgs = [rng.integers(0, 256, (h, w, 3), np.uint8)
            for w, h in ((16, 24), (32, 8))]
    n = sum(a.shape[0] * a.shape[1] for a in imgs)
    for c in range(3):
        sx = sum(int(a[:, :, c].astype(np.int64).sum()) for a in imgs)
        sx2 = sum(int((a[:, :, c].astype(np.int64) ** 2).sum()) for a in imgs)
        # the ppm formulas used by the query are exact rational floors
        mean_ppm = (sx * 10**6) // n
        var_ppm = ((n * sx2 - sx * sx) * 10**6) // (n * n)
        assert 0 <= mean_ppm < 256 * 10**6
        assert var_ppm >= 0
        # cross-check against float math within one ppm grid step
        xs = np.concatenate([a[:, :, c].ravel() for a in imgs]).astype(np.float64)
        assert abs(mean_ppm / 1e6 - xs.mean()) < 1e-6 + 1e-9 * xs.mean()
        assert abs(var_ppm / 1e6 - xs.var()) < 1e-6 + 1e-9 * xs.var()


def test_block_mean_matches_naive_nested_loop():
    # the image tower's only math kernel, pinned against a from-scratch
    # nested-loop box average (the goldens share _block_mean with the
    # engine, so THIS unit is where its independence check lives)
    from crawler_ray.pipelines.multimodal import _block_mean

    rng = np.random.default_rng(17)
    for h, w, oh, ow in ((48, 64, 8, 8), (7, 5, 3, 2), (8, 8, 8, 8)):
        g = rng.uniform(0, 255, (h, w))
        got = _block_mean(g, oh, ow)
        for i in range(oh):
            for j in range(ow):
                y0, y1 = (i * h) // oh, ((i + 1) * h) // oh
                x0, x1 = (j * w) // ow, ((j + 1) * w) // ow
                want = g[y0:y1, x0:x1].mean()
                assert abs(got[i, j] - want) < 1e-9
