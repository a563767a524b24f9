"""Multimodal (image/audio/video) pipeline stages.

Images are opaque ``binary`` columns with typed metadata (the store schema,
BASELINE.json input_hint). The PNG decode, verification, phash and
block-mean feature paths are REAL (crawler_ray.imaging); the model-based
embedding step is a clearly-marked deterministic STUB (no vision models in
this container) with the Ray-side plumbing — actor pool, batch sizing for
wide binary rows, schema — fully real and tested.

Audio/video decode are ``NotImplementedError`` stubs documenting the
intended schema, gated so pipelines can register them without importing
codecs that don't exist here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from crawler_ray.imaging import decode_png, phash64


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
        gray = rgb.astype(np.float64).mean(axis=2)
        feat = _block_mean(gray, 8, 8).ravel()
        norm = np.linalg.norm(feat)
        return (feat / norm if norm else feat).astype(np.float32)

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


def phash_near_dups(features_df: pd.DataFrame, max_hamming: int = 6) -> pd.DataFrame:
    """Near-duplicate images by phash Hamming distance (16-bit banding →
    verify), same blocking scheme as SimHash text dedup."""
    from crawler_ray.functions.dedup_ops import simhash_bucket_pairs

    df = features_df.rename(columns={"phash": "simhash"}).copy()
    df["doc_id"] = np.arange(len(df), dtype=np.int64)
    pairs = []
    sh = df["simhash"].to_numpy(np.int64).view(np.uint64)
    for band in range(4):
        chunk = ((sh >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64)
        g = df.assign(band_hash=chunk)
        for _, grp in g.groupby("band_hash"):
            if len(grp) > 1:
                pairs.append(simhash_bucket_pairs(grp, max_hamming))
    if not pairs:
        return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                             "doc_b": pd.Series([], dtype=np.int64),
                             "hamming": pd.Series([], dtype=np.int32)})
    out = pd.concat(pairs, ignore_index=True).drop_duplicates(["doc_a", "doc_b"])
    a = df.set_index("doc_id")["image_id"]
    out["image_a"] = out["doc_a"].map(a)
    out["image_b"] = out["doc_b"].map(a)
    return out[["image_a", "image_b", "hamming"]].sort_values(["image_a", "image_b"]).reset_index(drop=True)


# --- stubs: formats with no codec in this container --------------------------

AUDIO_SCHEMA = pa.schema([("audio_id", pa.string()), ("bytes", pa.binary()),
                          ("sample_rate", pa.int32()), ("channels", pa.int8()),
                          ("duration_s", pa.float64()), ("fmt", pa.string())])

VIDEO_SCHEMA = pa.schema([("video_id", pa.string()), ("bytes", pa.binary()),
                          ("w", pa.int32()), ("h", pa.int32()), ("fps", pa.float64()),
                          ("n_frames", pa.int32()), ("fmt", pa.string())])


def decode_audio(batch: pa.Table) -> pa.Table:
    """STUB — no audio codec in this container. A real implementation is an
    actor-pool map_batches over AUDIO_SCHEMA rows emitting
    (audio_id, pcm: list<float32>, sample_rate)."""
    raise NotImplementedError("audio decode requires a codec library (not in this container)")


def sample_video_frames(batch: pa.Table, every_n: int = 30) -> pa.Table:
    """STUB — no video codec in this container. A real implementation emits
    one store-schema image row per sampled frame."""
    raise NotImplementedError("video decode requires a codec library (not in this container)")
