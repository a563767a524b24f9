"""Multimodal (image/audio/video) pipeline stages.

Images are opaque ``binary`` columns with typed metadata (the store schema,
BASELINE.json input_hint). The PNG decode, verification, phash and
block-mean feature paths are REAL (crawler_ray.imaging); the model-based
embedding step is a clearly-marked deterministic STUB (no vision models in
this container) with the Ray-side plumbing — actor pool, batch sizing for
wide binary rows, schema — fully real and tested.

Audio/video decode are REAL spec-implemented codecs since 07faa57: a
RIFF/WAVE PCM16 chunk walker and a length-prefixed PNG-frame container
(sources/synthetic_media.py builds the fixtures; goldens decode with
independent readers, e.g. stdlib ``wave``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from crawler_ray.imaging import decode_png, phash64
from crawler_ray.sizing import exchange_width as _W


def _block_mean(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = gray.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    integral = np.zeros((h + 1, w + 1), np.float64)
    integral[1:, 1:] = gray.cumsum(0).cumsum(1)
    sums = (integral[ys[1:, None], xs[None, 1:]] - integral[ys[:-1, None], xs[None, 1:]]
            - integral[ys[1:, None], xs[None, :-1]] + integral[ys[:-1, None], xs[None, :-1]])
    areas = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    return sums / areas


def embed_rgb(rgb: np.ndarray) -> np.ndarray:
    """8×8 block-mean luminance grid, L2-normalized, float32 — the
    deterministic model-embedding stand-in shared by every image stage."""
    gray = rgb.astype(np.float64).mean(axis=2)
    feat = _block_mean(gray, 8, 8).ravel()
    norm = np.linalg.norm(feat)
    return (feat / norm if norm else feat).astype(np.float32)


class ImageFeaturizer:
    """Actor-pool stage: decode → verify dims → phash → 64-dim feature.

    The "feature" is an 8×8 block-mean luminance grid, L2-normalized — a
    deterministic stand-in for a model embedding (STUB: swap ``_embed`` for
    a real vision model's forward pass; the batch/actor plumbing is what a
    GPU stage would use, with small ``batch_size`` because rows carry image
    bytes).
    """

    def __init__(self):
        pass  # a real model would be loaded here, once per actor

    def _embed(self, rgb: np.ndarray) -> np.ndarray:
        return embed_rgb(rgb)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, fmts, phashes, feats = [], [], [], [], [], []
        for row in batch.to_pylist():
            rgb = decode_png(row["bytes"])
            assert rgb.shape[0] == row["h"] and rgb.shape[1] == row["w"], "dim mismatch"
            ids.append(row["image_id"])
            ws.append(row["w"]); hs.append(row["h"]); fmts.append(row["fmt"])
            phashes.append(phash64(rgb))
            feats.append(self._embed(rgb))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "w": pa.array(ws, pa.int32()), "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
            "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        })


def featurize_store(store_ds, concurrency: int = 2, batch_size: int = 64):
    """store Dataset (image_id, bytes, w, h, fmt, …) → feature table."""
    return store_ds.map_batches(
        ImageFeaturizer, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


# --------------------------------------------------------------------------
# VLM training-cost + layout kernels (round 5): patch-token accounting,
# SDXL-style aspect bucketing, and a CLIP-filter-shaped caption↔image
# alignment score. All integer-exact so results are bit-identical under any
# block layout (the repo-wide rule for anything that crosses an exchange).
# --------------------------------------------------------------------------

VIT_PATCH = 14          # ViT-L/14-style patch edge
MAX_PATCH_TOKENS = 32   # per-image token budget before a downscale is needed


def patch_tokens(w, h, patch: int = VIT_PATCH) -> np.ndarray:
    """ViT patch-token count per image: ceil(w/p) * ceil(h/p), int64."""
    w = np.asarray(w, np.int64)
    h = np.asarray(h, np.int64)
    return (-(-w // patch)) * (-(-h // patch))


# (bucket_w, bucket_h) sorted ASCENDING by aspect w/h — the SDXL-style
# fixed bucket table a resolution-bucketed trainer resizes into.
ASPECT_BUCKETS = ((640, 1536), (768, 1344), (832, 1216), (896, 1152),
                  (1024, 1024), (1152, 896), (1216, 832), (1344, 768),
                  (1536, 640))


def aspect_bucket_ids(w, h, buckets=ASPECT_BUCKETS) -> np.ndarray:
    """Nearest ASPECT_BUCKETS index in log-aspect space, integer-exact.

    For b_lo ≤ a ≤ b_hi (aspects), nearest-in-log picks lo iff
    a² ≤ b_lo·b_hi (the geometric-mean rule; ties → lo, the smaller
    index). With a = w/h and buckets bw/bh every comparison
    cross-multiplies to int64 — no float log, so assignment is exact and
    layout-independent. Out-of-range aspects clamp to the end buckets.
    """
    w = np.asarray(w, np.int64)
    h = np.asarray(h, np.int64)
    bw = np.array([b[0] for b in buckets], np.int64)
    bh = np.array([b[1] for b in buckets], np.int64)
    nb = len(bw)
    # a >= bucket_j aspect  ⇔  w*bh_j >= bw_j*h ; buckets ascending ⇒ the
    # row is a prefix of Trues and its sum is the first bucket with
    # aspect > a.
    ge = w[:, None] * bh[None, :] >= bw[None, :] * h[:, None]
    i = ge.sum(axis=1)
    lo = np.clip(i - 1, 0, nb - 1)
    hi = np.clip(i, 0, nb - 1)
    lhs = w * w * bh[lo] * bh[hi]          # a² ≤ b_lo·b_hi, cross-multiplied
    rhs = bw[lo] * bw[hi] * h * h
    return np.where(lhs <= rhs, lo, hi).astype(np.int64)


CAP_DIM = 64            # hashed bag-of-words dim == image feature dim
TOWER_Q = 1 << 15       # tower-vector quantization grid
ALIGN_SCALE = TOWER_Q * TOWER_Q  # alignment scores live on the fq·cq 2³⁰ grid


def caption_embed(captions) -> np.ndarray:
    """(n, CAP_DIM) float64 unit rows: hashed bag-of-words text embedding
    (xxh64(token) mod CAP_DIM, count-weighted, L2-normalized) — the
    deterministic text-tower stand-in for a CLIP-style alignment filter.
    Vectorized: one explode + one xxh64 pass over every token in the batch.
    """
    from crawler_ray.hashing import xxh64_array

    s = pd.Series(captions, dtype=object).fillna("").reset_index(drop=True)
    mat = np.zeros((len(s), CAP_DIM), np.float64)
    toks = s.str.split().explode().dropna()
    toks = toks[toks != ""]
    if len(toks):
        rows = toks.index.to_numpy(np.int64)
        dims = (xxh64_array(toks.tolist()) % np.uint64(CAP_DIM)).astype(np.int64)
        np.add.at(mat, (rows, dims), 1.0)
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    norm[norm == 0.0] = 1.0
    return mat / norm


class TowerStage:
    """Actor-pool stage: decode image → BOTH tower embeddings (image
    block-mean, hashed-BoW caption), each floor-quantized to the TOWER_Q
    grid. One decode pass serves every downstream alignment consumer:
    the CLIP-filter gate computes ``align_q = fq·cq`` (an integer dot on
    the 2³⁰ grid — exact under any BLAS kernel or block layout) and the
    retrieval eval runs a per-host integer GEMM over the same vectors.
    This is the LAION-pipeline shape: swap both towers for real model
    forwards; the batch/actor plumbing and the quantize-then-integer-dot
    determinism rule stay as-is. Emits (image_id, host, fmt, fq, cq).
    """

    def __init__(self):
        pass  # real text+vision towers would load here, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        cap_vecs = caption_embed(batch.column("caption").to_pylist())
        ids, hosts, fmts, fqs, cqs = [], [], [], [], []
        for k, row in enumerate(batch.to_pylist()):
            feat = embed_rgb(decode_png(row["bytes"])).astype(np.float64)
            ids.append(row["image_id"])
            hosts.append(row["host"])
            fmts.append(row["fmt"])
            fqs.append(np.floor(feat * TOWER_Q).astype(np.int64).tolist())
            cqs.append(np.floor(cap_vecs[k] * TOWER_Q).astype(np.int64).tolist())
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "fmt": pa.array(fmts, pa.string()),
            "fq": pa.array(fqs, pa.list_(pa.int64())),
            "cq": pa.array(cqs, pa.list_(pa.int64())),
        })


BUCKET_SCALE_DIV = 32   # fixture-scale bucket targets: ASPECT_BUCKETS / 32
#                         (the real pipeline resizes into the 1024-class
#                         dims themselves; the fixture's 48–96 px images
#                         need targets ≤ 48 so the box filter only ever
#                         downsamples — _block_mean has no upscale path)


class BucketResizeStage:
    """Actor-pool stage: decode → resize each image into its aspect
    bucket's fixed target (``ASPECT_BUCKETS[b] // BUCKET_SCALE_DIV``, the
    SDXL preprocessing step that follows bucket assignment) → re-encode
    PNG. Fully real end-to-end (pure-numpy codec + box filter). Emits
    (image_id, bucket, out_w, out_h, bytes)."""

    def __init__(self, scale_div: int = BUCKET_SCALE_DIV):
        self.scale_div = scale_div

    def __call__(self, batch: pa.Table) -> pa.Table:
        from crawler_ray.imaging import encode_png

        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        buckets = aspect_bucket_ids(ws, hs)
        ids, bks, ows, ohs, bts = [], [], [], [], []
        for k, row in enumerate(batch.to_pylist()):
            b = int(buckets[k])
            tw = ASPECT_BUCKETS[b][0] // self.scale_div
            th = ASPECT_BUCKETS[b][1] // self.scale_div
            rgb = decode_png(row["bytes"])
            out = resize_rgb(rgb, th, tw)
            ids.append(row["image_id"])
            bks.append(b)
            ows.append(tw)
            ohs.append(th)
            bts.append(encode_png(out))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bucket": pa.array(bks, pa.int64()),
            "out_w": pa.array(ows, pa.int32()),
            "out_h": pa.array(ohs, pa.int32()),
            "bytes": pa.array(bts, pa.binary()),
        })


def phash_near_dups(features_ds, max_hamming: int = 6) -> pd.DataFrame:
    """Near-duplicate images by phash Hamming distance, distributed: band
    explode via map_batches → sort-shuffle bucket collision with per-block
    vectorized kernels (dedup_ops.banded_candidate_pairs) → candidate-scale
    pair dedup. Uses 8 bands of 8 bits so the pigeonhole guarantee covers
    Hamming ≤ 7 ⊇ the default threshold 6 (4×16 banding only guarantees
    ≤ 3 — pairs at distance 4–6 could be missed).

    ``features_ds`` is a Dataset with (image_id, phash) columns (e.g. the
    output of ``featurize_store``); a pandas DataFrame also works for tests.
    """
    import functools

    import ray.data as rd

    from crawler_ray.functions.dedup_ops import (
        banded_candidate_pairs,
        hamming_collide_block,
        hash_bands,
    )

    n_bands = next(b for b in (4, 8, 16, 32) if b >= max_hamming + 1)
    if isinstance(features_ds, pd.DataFrame):
        features_ds = rd.from_pandas(features_ds[["image_id", "phash"]])
    bands_fn = functools.partial(hash_bands, bands=n_bands,
                                 id_col="image_id", hash_col="phash")
    collide_fn = functools.partial(hamming_collide_block, max_hamming=max_hamming,
                                   id_col="image_id", hash_col="phash",
                                   a_col="image_a", b_col="image_b", id_dtype=object)
    bands = features_ds.map_batches(bands_fn, batch_format="pandas")
    out = banded_candidate_pairs(bands, collide_fn)
    out = out.drop_duplicates(["image_a", "image_b"])
    if len(out) == 0:
        return pd.DataFrame({"image_a": pd.Series([], dtype=str),
                             "image_b": pd.Series([], dtype=str),
                             "hamming": pd.Series([], dtype=np.int32)})
    out["hamming"] = out["hamming"].astype(np.int32)
    return out.sort_values(["image_a", "image_b"]).reset_index(drop=True)


# cosine threshold for the feature near-dup query — set from the measured
# sim distribution of the golden fixture store (block-mean luminance
# features are all-positive vectors, so random-pair cosines sit high:
# median ≈ 0.943, p99 ≈ 0.979). 0.988 sits in a wide gap of that
# distribution (nearest pair sims 0.98782 below / 0.98883 above), so the
# float64 engine path and the straight-line golden cannot disagree at the
# boundary, and the golden is non-empty (6 pairs at sf fixture scale).
FEATURE_NEAR_DUP_THRESHOLD = 0.988


def feature_near_dups(features_ds,
                      threshold: float = FEATURE_NEAR_DUP_THRESHOLD) -> pd.DataFrame:
    """Near-duplicate images by EMBEDDING COSINE over the feature vectors
    (the deterministic model-embedding stand-in from ``ImageFeaturizer``) —
    the image-side twin of ``embedding_near_dups``: distributed via the
    exact tile grid (``ann.tiled_near_dup_pairs`` — block-pair Ray tasks,
    no whole-corpus broadcast; the driver receives result pairs only).

    Ids travel through the GEMM tiles as xxh64(image_id) int64 (2^-64-scale
    collision odds); the candidate-scale pair table maps back to string
    ids with ONE keyed shuffle join — pairs exploded to long format
    (pair_idx, side, vid), joined against the (vec_id → image_id) map,
    pivoted back on the driver (candidate-scale strings only; no corpus
    dict ever leaves the cluster). One join rather than two because
    chaining a hash-shuffle join's output into a second hash-shuffle join
    corrupts the left-side schema in ray 2.49 ("No match or multiple
    matches for key field reference" from the aggregator's finalize) when
    the sides derive from a materialized dataset. Returns
    (image_a, image_b, sim) with image_a < image_b lexicographically."""
    import ray.data as rd

    from crawler_ray.functions import ann
    from crawler_ray.hashing import xxh64_array

    def with_vid(b: pd.DataFrame) -> pa.Table:
        b = b.drop_duplicates("image_id")
        # emit a PLAIN Arrow list<float32> embedding column: returning a
        # pandas object column here would make Ray store the block with its
        # tensor-extension type + pandas metadata, which ann's RAW tile
        # tasks cannot to_pandas in workers that never imported ray.data
        return pa.table({
            "vec_id": pa.array(xxh64_array([str(s) for s in b["image_id"]]).view(np.int64)),
            "embedding": pa.array([np.asarray(f, np.float32) for f in b["feature"]],
                                  pa.list_(pa.float32())),
            "image_id": pa.array([str(s) for s in b["image_id"]], pa.string()),
        })

    empty = pd.DataFrame({"image_a": pd.Series([], dtype=str),
                          "image_b": pd.Series([], dtype=str),
                          "sim": pd.Series([], dtype=np.float64)})
    vecs = features_ds.map_batches(with_vid, batch_format="pandas").materialize()
    pairs = ann.tiled_near_dup_pairs(vecs, threshold)
    if len(pairs) == 0:
        return empty

    n = len(pairs)
    long = pd.DataFrame({
        "pair_idx": np.concatenate([np.arange(n), np.arange(n)]).astype(np.int64),
        "side": np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)]),
        "vid": np.concatenate([pairs["vid_a"].to_numpy(np.int64),
                               pairs["vid_b"].to_numpy(np.int64)]),
    })
    idmap = vecs.map_batches(
        lambda b: pd.DataFrame({"vid": b["vec_id"].to_numpy(np.int64),
                                "image_id": b["image_id"].astype(str)}),
        batch_format="pandas")
    joined = (rd.from_pandas(long)
              .join(idmap, join_type="inner", num_partitions=_W(), on=("vid",))
              .to_pandas())
    if len(joined) < 2 * n:
        raise RuntimeError("feature_near_dups: id-map join dropped pairs "
                           f"({len(joined)} of {2 * n} long rows)")
    names = np.empty((n, 2), dtype=object)
    names[joined["pair_idx"].to_numpy(np.int64),
          joined["side"].to_numpy(np.int8)] = joined["image_id"].astype(str)
    a = np.minimum(names[:, 0], names[:, 1])
    b = np.maximum(names[:, 0], names[:, 1])
    out = pd.DataFrame({"image_a": a.astype(str), "image_b": b.astype(str),
                        "sim": pairs["sim"].to_numpy(np.float64)})
    out = out.drop_duplicates(["image_a", "image_b"])
    return out.sort_values(["image_a", "image_b"]).reset_index(drop=True)


def resize_rgb(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-averaged (box-filter) downsample via the integral-image block
    mean — the pure-numpy analogue of INTER_AREA. Output is uint8."""
    chans = [_block_mean(rgb[:, :, c].astype(np.float64), out_h, out_w)
             for c in range(rgb.shape[2])]
    return np.clip(np.rint(np.stack(chans, axis=2)), 0, 255).astype(np.uint8)


class ImageResizer:
    """Actor-pool stage: decode → box-resize to a ``max_side`` thumbnail
    (aspect preserved, no upscaling, min side clamped to 8 so the phash
    grid stays well-defined) → re-encode PNG. Fully real end-to-end (the
    PNG codec and resize are pure numpy); small ``batch_size`` because
    rows carry image bytes. Emits store-schema thumbnail rows."""

    def __init__(self, max_side: int = 32):
        self.max_side = max_side

    def _target(self, h: int, w: int) -> tuple[int, int]:
        scale = self.max_side / max(h, w)
        if scale >= 1.0:
            return h, w
        return max(8, round(h * scale)), max(8, round(w * scale))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from crawler_ray.imaging import encode_png

        ids, bts, ws, hs, phs = [], [], [], [], []
        for row in batch.to_pylist():
            rgb = decode_png(row["bytes"])
            th, tw = self._target(rgb.shape[0], rgb.shape[1])
            if (th, tw) != rgb.shape[:2]:
                rgb = resize_rgb(rgb, th, tw)
            ids.append(row["image_id"])
            bts.append(encode_png(rgb))
            ws.append(tw)
            hs.append(th)
            phs.append(phash64(rgb))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bts, pa.binary()),
            "w": pa.array(ws, pa.int32()), "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(["png"] * len(ids), pa.string()),
            "phash": pa.array(phs, pa.int64()),
        })


def thumbnail_store(store_ds, max_side: int = 32, concurrency: int = 2,
                    batch_size: int = 32):
    """store Dataset → thumbnail store rows (resize as an actor pool)."""
    return store_ds.map_batches(
        ImageResizer, fn_constructor_kwargs=dict(max_side=max_side),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def sharpness_stats(store_ds, min_var_ppm: int, concurrency: int = 2,
                    batch_size: int = 64):
    """Blur gate: per-image variance-of-Laplacian rows ``(image_id,
    lap_var_ppm, sharp)`` — the sharpness pre-filter a LAION-style corpus
    applies before training. One zero-shuffle actor-pool decode pass
    (bytes never leave the stage); integer-exact on any layout
    (imaging.laplacian_var_ppm). Returns the Dataset lazily."""
    from crawler_ray.imaging import laplacian_var_ppm

    class Sharp:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, v = [], []
            for row in batch.to_pylist():
                ids.append(row["image_id"])
                v.append(laplacian_var_ppm(decode_png(row["bytes"])))
            arr = np.asarray(v, np.int64) if v else np.zeros(0, np.int64)
            return pa.table({
                "image_id": pa.array(ids, pa.string()),
                "lap_var_ppm": pa.array(arr, pa.int64()),
                "sharp": pa.array((arr >= min_var_ppm).astype(np.int64),
                                  pa.int64())})

    return store_ds.map_batches(Sharp, batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=concurrency)


def interleave_docs(store_meta_ds, pages_ds, budget: int):
    """MMC4/OBELICS-style interleaved image-text document assembly: pages
    ⋈ store meta on the image's source URL — a distributed hash join with
    BOTH sides corpus-scale at 100 TB — then per page, in image_id order,
    images are admitted while ``title tokens + Σ(patch_tokens + caption
    tokens)`` stays within ``budget`` (the trainer's context window).
    Per-page groups are tiny (images-per-page), so the assemble runs as
    groupby(url).map_groups. All accounting is integer — no float rule
    can split engine and oracle. Returns a Dataset of per-page rows
    ``(url, n_images, n_kept, text_tokens, image_tokens, total_tokens)``.

    ``store_meta_ds`` needs columns (image_id, src_url, w, h, caption);
    ``pages_ds`` needs (url, title) — prune at the read."""
    joined = store_meta_ds.join(pages_ds, join_type="inner",
                                num_partitions=_W(),
                                on=("src_url",), right_on=("url",))

    def assemble_block(b: pd.DataFrame) -> pd.DataFrame:
        cols = ["url", "n_images", "n_kept", "text_tokens", "image_tokens",
                "total_tokens"]
        if len(b) == 0:
            return pd.DataFrame({"url": pd.Series([], dtype=object),
                                 **{c: pd.Series([], dtype=np.int64)
                                    for c in cols[1:]}})
        # admission stops at the FIRST image that overflows; image costs
        # are positive so the cumulative total is monotone and the
        # admitted set is exactly the prefix where title + cumsum(cost)
        # fits — which vectorizes as one grouped cumsum (no per-group
        # Python; measured 1,092 → >30k pages/s on the bench store)
        b = b.sort_values(["src_url", "image_id"], kind="mergesort")
        cap = b["caption"].astype("string")
        ctok = (cap.str.count(" ").to_numpy(np.int64) + 1)
        ctok = np.where(cap.str.len().to_numpy(np.int64) == 0, 0, ctok)
        cost = patch_tokens(b["w"].to_numpy(np.int64),
                            b["h"].to_numpy(np.int64)) + ctok
        ttl = b["title"].astype("string")
        ttok = ttl.str.count(" ").to_numpy(np.int64) + 1
        ttok = np.where(ttl.str.len().to_numpy(np.int64) == 0, 0, ttok)
        g = pd.DataFrame({"url": b["src_url"].to_numpy(object),
                          "cost": cost, "ttok": ttok})
        keep = ((g["ttok"] + g.groupby("url", sort=False)["cost"].cumsum())
                <= budget).to_numpy()
        g["kept_cost"] = np.where(keep, cost, 0)
        g["kept"] = keep.astype(np.int64)
        out = g.groupby("url", as_index=False, sort=False).agg(
            n_images=("cost", "size"), n_kept=("kept", "sum"),
            text_tokens=("ttok", "first"), image_tokens=("kept_cost", "sum"))
        out["total_tokens"] = out["text_tokens"] + out["image_tokens"]
        for c in cols[1:]:
            out[c] = out[c].astype(np.int64)
        return out[cols]

    # the hash join co-locates each url's rows in one partition, so the
    # per-block assembly is globally exact by co-location
    return joined.map_batches(assemble_block, batch_format="pandas",
                              batch_size=None)


def caption_dedup_stats(store_meta_ds) -> pd.DataFrame:
    """Exact caption dedup (the LAION boilerplate-caption drop): key =
    xxh64(caption), keep the lexicographically-first image_id per caption
    globally, roll up per host. One caption-keyed exchange co-locates
    every hash group whole (first-wins is then a per-block groupby —
    globally exact by co-location); the per-host rollup is a zero-shuffle
    combiner + driver fold, so the returned frame is result-scale
    (hosts). ``store_meta_ds`` needs (image_id, caption, host)."""
    import ray.data as rd

    from crawler_ray.hashing import xxh64_array
    from crawler_ray.pipelines.queries import _fold, _keyed

    def key(b: pd.DataFrame) -> pd.DataFrame:
        h = xxh64_array(b["caption"].tolist()).view(np.int64)
        return pd.DataFrame({"cap_hash": h,
                             "image_id": b["image_id"].astype(object),
                             "host": b["host"].astype(object)})

    keyed = store_meta_ds.map_batches(key, batch_format="pandas")

    def winners(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"host": pd.Series([], dtype=object),
                                 "n_images": pd.Series([], dtype=np.int64),
                                 "n_kept": pd.Series([], dtype=np.int64)})
        first = b.sort_values("image_id").groupby("cap_hash",
                                                  as_index=False).first()
        alln = b.groupby("host", as_index=False).size().rename(
            columns={"size": "n_images"})
        keep = first.groupby("host", as_index=False).size().rename(
            columns={"size": "n_kept"})
        out = alln.merge(keep, on="host", how="left")
        out["n_kept"] = out["n_kept"].fillna(0).astype(np.int64)
        return out

    dk = (_keyed(keyed).repartition(_W(), keys=["cap_hash"])
          .map_batches(winners, batch_format="pandas", batch_size=None)
          .materialize())
    dk.context.shuffle_strategy = rd.DataContext.get_current().shuffle_strategy
    out = _fold(dk, ["host"], dict(n_images=("n_images", "sum"),
                                   n_kept=("n_kept", "sum")))
    out["n_dropped"] = out["n_images"] - out["n_kept"]
    for c in ("n_images", "n_kept", "n_dropped"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("host").reset_index(drop=True)


def image_audit_stats(store_ds) -> pd.DataFrame:
    """Binary-column data contract (the image twin of the
    ``validate_documents`` audit): per host, how many stored blobs fail
    each integrity rule — PNG signature, per-chunk CRC32
    (imaging.png_audit — the check the fast decode path skips), IHDR dims
    vs the metadata columns, decode errors, and a full decode→phash
    recompute vs the stored ``phash`` (silent-corruption detection: a
    blob can be structurally valid yet not be the image the manifest
    indexed). One zero-shuffle combiner pass; bytes never leave the
    stage; the returned frame is result-scale (hosts).

    ``n_phash_bad`` counts only rows that DECODED (decode failures are
    ``n_decode_err`` — the two rules are disjoint by definition)."""
    from crawler_ray.imaging import phash64, png_audit
    from crawler_ray.pipelines.queries import _fold

    COLS = ["n_images", "n_sig_bad", "n_crc_bad", "n_dims_bad",
            "n_decode_err", "n_phash_bad"]

    def partial(batch: pa.Table) -> pd.DataFrame:
        recs: dict[str, list[int]] = {}
        for row in batch.to_pylist():
            a = png_audit(row["bytes"])
            s = recs.setdefault(row["host"], [0] * 6)
            s[0] += 1
            s[1] += 0 if a["sig_ok"] else 1
            s[2] += 0 if a["crc_ok"] else 1
            s[3] += 0 if (a["w"] == row["w"] and a["h"] == row["h"]) else 1
            try:
                rgb = decode_png(row["bytes"])
            except Exception:
                s[4] += 1
                continue
            s[5] += 0 if phash64(rgb) == row["phash"] else 1
        return pd.DataFrame(
            [dict(host=hst, **dict(zip(COLS, v)))
             for hst, v in sorted(recs.items())]) if recs else pd.DataFrame(
            {"host": pd.Series([], dtype=object),
             **{c: pd.Series([], dtype=np.int64) for c in COLS}})

    parts = store_ds.map_batches(partial, batch_format="pyarrow",
                                 batch_size=64)
    out = _fold(parts, ["host"], {c: (c, "sum") for c in COLS})
    for c in COLS:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("host").reset_index(drop=True)


# --- audio / video: REAL decode over opaque binary columns -------------------
# No media libraries exist in this container, so the codecs are implemented
# from their public specs in sources/synthetic_media.py: a chunk-walking
# RIFF/WAVE PCM16 parser for audio, and an explicit length-prefixed
# PNG-frame container (RVID) for video whose frames decode through the
# repo's pure-numpy PNG codec. The Ray-side plumbing is the production
# shape either way: binary column in, actor-pool map_batches with small
# batches (payload-heavy rows), typed feature/frame rows out.

AUDIO_SCHEMA = pa.schema([("audio_id", pa.string()), ("bytes", pa.binary()),
                          ("sample_rate", pa.int32()), ("channels", pa.int8()),
                          ("duration_s", pa.float64()), ("fmt", pa.string())])

VIDEO_SCHEMA = pa.schema([("video_id", pa.string()), ("bytes", pa.binary()),
                          ("w", pa.int32()), ("h", pa.int32()), ("fps", pa.float64()),
                          ("n_frames", pa.int32()), ("fmt", pa.string())])


def decode_audio(batch: pa.Table) -> pa.Table:
    """(audio_id, bytes) → per-clip decoded features: a REAL WAV parse
    (magic/chunk validation) + vectorized numpy features per clip.
    Malformed payloads surface as decode errors, not silent rows."""
    from crawler_ray.sources.synthetic_media import audio_features

    ids = batch["audio_id"].to_pylist()
    feats = [audio_features(b) for b in batch["bytes"].to_pylist()]
    return pa.table({
        "audio_id": pa.array([str(i) for i in ids], pa.string()),
        "sample_rate": pa.array([f["sample_rate"] for f in feats], pa.int32()),
        "n_samples": pa.array([f["n_samples"] for f in feats], pa.int64()),
        "duration_s": pa.array([round(f["duration_s"], 6) for f in feats], pa.float64()),
        "rms": pa.array([round(f["rms"], 6) for f in feats], pa.float64()),
        "zcr": pa.array([round(f["zcr"], 6) for f in feats], pa.float64()),
        "dominant_hz": pa.array([round(f["dominant_hz"], 3) for f in feats], pa.float64()),
    })


def sample_video_frames(batch: pa.Table, every_n: int = 4) -> pa.Table:
    """(video_id, bytes) → one row per SAMPLED frame (every ``every_n``-th,
    always including frame 0): container parse + real per-frame PNG decode
    + phash — the training-data frame-extraction shape."""
    from crawler_ray.imaging import decode_png, phash64
    from crawler_ray.sources.synthetic_media import read_video_container

    vids, idxs, ws, hs, phs, fpss = [], [], [], [], [], []
    for vid, data in zip(batch["video_id"].to_pylist(), batch["bytes"].to_pylist()):
        n_frames, fps, frames = read_video_container(data)
        for i in range(0, n_frames, every_n):
            rgb = decode_png(frames[i])
            vids.append(str(vid))
            idxs.append(i)
            hs.append(rgb.shape[0])
            ws.append(rgb.shape[1])
            phs.append(phash64(rgb))
            fpss.append(fps)
    return pa.table({
        "video_id": pa.array(vids, pa.string()),
        "frame_idx": pa.array(idxs, pa.int32()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fps": pa.array(fpss, pa.int32()),
        "phash": pa.array(np.array(phs, np.uint64)),
    })


# --- audio / video near-duplicates -------------------------------------------

def _audio_grid_rows(b: pd.DataFrame, cell_hz: float) -> pd.DataFrame:
    """Blocking rows for the audio near-dup grid: bucket key =
    (n_samples, dominant-frequency cell), each clip replicated to its home
    cell AND the next cell (ghost), so any pair within ``cell_hz`` Hz shares
    at least one bucket — the 1-D analogue of the embedding tile grid."""
    cells = np.floor(b["dominant_hz"].to_numpy(np.float64) / cell_hz).astype(np.int64)
    n = b["n_samples"].to_numpy(np.int64)
    keep = b[["audio_id", "rms", "zcr", "dominant_hz"]]
    home = keep.assign(band=n, band_hash=cells)
    ghost = keep.assign(band=n, band_hash=cells + 1)
    return pd.concat([home, ghost], ignore_index=True)


_AUDIO_PAIRS_EMPTY = dict(audio_a=str, audio_b=str, d_rms=np.float64)


def _audio_collide_block(b: pd.DataFrame, max_d_rms: float, max_d_zcr: float,
                         max_d_hz: float) -> pd.DataFrame:
    """Per-bucket verify kernel (runs after bucket co-location): all pairs
    in a bucket checked against the joint feature rule, vectorized via
    triangular index arrays. Emits typed empties (hash-partitioned blocks
    can arrive schema-less)."""
    empty = pd.DataFrame({c: pd.Series([], dtype=t) for c, t in _AUDIO_PAIRS_EMPTY.items()})
    if len(b) == 0:
        return empty
    hot = b.loc[b.duplicated(["band", "band_hash"], keep=False)]
    pieces = []
    for _, g in hot.groupby(["band", "band_hash"]):
        g = g.drop_duplicates("audio_id")
        m = len(g)
        if m < 2:
            continue
        ii, jj = np.triu_indices(m, k=1)
        rms = g["rms"].to_numpy(np.float64)
        zcr = g["zcr"].to_numpy(np.float64)
        hz = g["dominant_hz"].to_numpy(np.float64)
        ids = g["audio_id"].to_numpy(object)
        d_rms = np.abs(rms[ii] - rms[jj])
        ok = ((d_rms <= max_d_rms)
              & (np.abs(zcr[ii] - zcr[jj]) <= max_d_zcr)
              & (np.abs(hz[ii] - hz[jj]) <= max_d_hz))
        if not ok.any():
            continue
        a, bb = ids[ii[ok]], ids[jj[ok]]
        pieces.append(pd.DataFrame({"audio_a": np.minimum(a, bb).astype(str),
                                    "audio_b": np.maximum(a, bb).astype(str),
                                    "d_rms": d_rms[ok]}))
    if not pieces:
        return empty
    out = pd.concat(pieces, ignore_index=True)
    return out.drop_duplicates(["audio_a", "audio_b"])


def audio_near_dup_pairs(features_ds, max_d_rms: float = 0.02,
                         max_d_zcr: float = 0.015,
                         max_d_hz: float = 4.0) -> pd.DataFrame:
    """Near-duplicate audio clips by joint feature distance (same length,
    |ΔRMS| ≤ max_d_rms, |ΔZCR| ≤ max_d_zcr, |Δdominant_hz| ≤ max_d_hz) —
    the "same recording, different master" rule. Distributed as a 1-D grid:
    clips block on (n_samples, ⌊dominant_hz / max_d_hz⌋) with ghost
    replication to the next cell (complete w.r.t. the rule: |Δhz| ≤ cell
    width ⇒ same or adjacent cell), sort-shuffle bucket collision
    (``banded_candidate_pairs``), vectorized in-bucket verification. The
    driver receives RESULT pairs only.

    ``features_ds``: Dataset with (audio_id, n_samples, rms, zcr,
    dominant_hz) — the output of ``featurize_audio``; a pandas DataFrame
    also works for tests."""
    import functools

    import ray.data as rd

    from crawler_ray.functions.dedup_ops import banded_candidate_pairs

    if isinstance(features_ds, pd.DataFrame):
        features_ds = rd.from_pandas(features_ds)
    rows = features_ds.map_batches(
        functools.partial(_audio_grid_rows, cell_hz=max_d_hz), batch_format="pandas")
    out = banded_candidate_pairs(
        rows, functools.partial(_audio_collide_block, max_d_rms=max_d_rms,
                                max_d_zcr=max_d_zcr, max_d_hz=max_d_hz))
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in _AUDIO_PAIRS_EMPTY.items()})
    out = out.drop_duplicates(["audio_a", "audio_b"])
    out["d_rms"] = out["d_rms"].round(6)
    return out.sort_values(["audio_a", "audio_b"]).reset_index(drop=True)


def _video_grid_rows(b: pd.DataFrame) -> pd.DataFrame:
    """Bucket rows for shared-frame detection: bucket key = the frame phash
    itself (exact match, no ghosting needed)."""
    return pd.DataFrame({
        "band": np.zeros(len(b), np.int64),
        "band_hash": b["phash"].to_numpy(np.uint64),
        "video_id": b["video_id"].astype(str),
    })


_VIDEO_PAIRS_EMPTY = dict(video_a=str, video_b=str, shared=np.int64)


def _video_collide_block(b: pd.DataFrame, max_group: int) -> pd.DataFrame:
    """Per-phash-bucket kernel: one incidence row per cross-video pair
    sharing this frame hash. Buckets larger than ``max_group`` videos are
    stop-word frames (solid-color cards, slates) and are dropped — the
    standard guard against the quadratic blowup a degenerate frame causes
    at corpus scale."""
    empty = pd.DataFrame({c: pd.Series([], dtype=t) for c, t in _VIDEO_PAIRS_EMPTY.items()})
    if len(b) == 0:
        return empty
    b = b.drop_duplicates(["video_id", "band_hash"])
    hot = b.loc[b.duplicated(["band", "band_hash"], keep=False)]
    pieces = []
    for _, g in hot.groupby(["band", "band_hash"]):
        m = len(g)
        if m < 2 or m > max_group:
            continue
        ii, jj = np.triu_indices(m, k=1)
        ids = g["video_id"].to_numpy(object)
        a, bb = ids[ii], ids[jj]
        pieces.append(pd.DataFrame({"video_a": np.minimum(a, bb).astype(str),
                                    "video_b": np.maximum(a, bb).astype(str),
                                    "shared": np.ones(len(ii), np.int64)}))
    if not pieces:
        return empty
    return pd.concat(pieces, ignore_index=True)


def video_shared_phash_pairs(frames_ds, min_shared: int = 2,
                             max_group: int = 64) -> pd.DataFrame:
    """Near-duplicate videos by shared sampled-frame phashes (≥ min_shared
    distinct frame hashes in common — catches re-cuts/trims/re-uploads).
    Distributed: (video_id, phash) rows bucket on the phash via sort-shuffle
    collision (``banded_candidate_pairs_ds`` — each bucket handled whole,
    exactly once), one incidence row per pair per shared hash, then a
    pair-sorted per-block count fold with a driver boundary merge — the
    corpus-scale incidence set never lands on the driver unfolded.

    ``frames_ds``: Dataset with (video_id, phash) — the output of
    ``video_frames``; a pandas DataFrame also works for tests."""
    import functools

    import ray.data as rd

    from crawler_ray.functions.dedup_ops import banded_candidate_pairs_ds

    empty = pd.DataFrame({c: pd.Series([], dtype=t) for c, t in _VIDEO_PAIRS_EMPTY.items()})
    if isinstance(frames_ds, pd.DataFrame):
        frames_ds = rd.from_pandas(frames_ds)
    rows = frames_ds.map_batches(_video_grid_rows, batch_format="pandas")
    inc_ds = banded_candidate_pairs_ds(
        rows, functools.partial(_video_collide_block, max_group=max_group))

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return empty
        return b.groupby(["video_a", "video_b"], as_index=False).agg(
            shared=("shared", "sum"))

    folded = (inc_ds.sort(["video_a", "video_b"])
              .map_batches(fold, batch_format="pandas", batch_size=None)
              .to_pandas())
    out = fold(folded)
    out = out[out["shared"] >= min_shared]
    if len(out) == 0:
        return empty
    out["shared"] = out["shared"].astype(np.int64)
    return out.sort_values(["video_a", "video_b"]).reset_index(drop=True)


def featurize_audio(audio_ds, concurrency: int = 2, batch_size: int = 64):
    """Audio Dataset (audio_id, bytes) → decoded feature rows (actor pool;
    payload-heavy rows ⇒ small batches)."""
    return audio_ds.map_batches(decode_audio, batch_format="pyarrow",
                                batch_size=batch_size, concurrency=concurrency)


def video_frames(video_ds, every_n: int = 4, concurrency: int = 2,
                 batch_size: int = 16):
    """Video Dataset (video_id, bytes) → sampled-frame rows (actor pool)."""
    import functools

    return video_ds.map_batches(
        functools.partial(sample_video_frames, every_n=every_n),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def cross_corpus_phash_dups(features_ds, side_of, max_hamming: int = 6,
                            n_bands: int = 8) -> pd.DataFrame:
    """Incremental image dedup: which NEW images (side 1) near-duplicate an
    image already in the REFERENCE corpus (side 0), by phash Hamming ≤
    ``max_hamming``. The per-wave operation of a continuous crawl — new
    content checks against 10^10 stored images without the ref×ref
    quadratic term: banding is the same pigeonhole blocking as
    ``phash_near_dups`` (8×8-bit bands cover Hamming ≤ 7), the collide
    kernel only verifies buckets containing BOTH sides, and pairs are
    new×ref only.

    ``side_of(batch) -> int {0,1} array`` derives the side from the batch
    (deterministic split in the query; in production, the wave id)."""
    import functools

    import ray.data as rd

    from crawler_ray.functions.dedup_ops import (
        banded_candidate_pairs,
        cross_hamming_collide_block,
        hash_bands,
    )

    if isinstance(features_ds, pd.DataFrame):
        features_ds = rd.from_pandas(features_ds[["image_id", "phash"]])

    def tag_and_band(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates("image_id").assign(
            side=np.asarray(side_of(b.drop_duplicates("image_id")), np.int8))
        return hash_bands(b, bands=n_bands, id_col="image_id",
                          hash_col="phash", carry_cols=("side",))

    collide_fn = functools.partial(cross_hamming_collide_block,
                                   max_hamming=max_hamming)
    bands = features_ds.map_batches(tag_and_band, batch_format="pandas")
    out = banded_candidate_pairs(bands, collide_fn)
    out = out.drop_duplicates(["new_id", "ref_id"])
    if len(out) == 0:
        return pd.DataFrame({"new_id": pd.Series([], dtype=str),
                             "ref_id": pd.Series([], dtype=str),
                             "hamming": pd.Series([], dtype=np.int32)})
    out["hamming"] = out["hamming"].astype(np.int32)
    return out.sort_values(["new_id", "ref_id"]).reset_index(drop=True)
