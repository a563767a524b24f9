"""Multimodal stages: real decode/feature plumbing, stubbed codecs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from crawler_ray.imaging import encode_png
from crawler_ray.pipelines import multimodal
from crawler_ray.sources.synthetic_web import image_array, image_bytes


def _store_table(n=6):
    rows = []
    for i in range(n):
        iid = f"{i:016x}"
        w, h = 48, 64
        rows.append({"image_id": iid, "bytes": image_bytes(iid, w, h, "png"),
                     "w": w, "h": h, "fmt": "png"})
    return pa.Table.from_pylist(rows)


def test_featurizer_decodes_and_embeds():
    f = multimodal.ImageFeaturizer()
    out = f(_store_table())
    assert out.num_rows == 6
    feats = out["feature"].to_pylist()
    assert all(len(v) == 64 for v in feats)
    norms = [np.linalg.norm(v) for v in feats]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)  # L2-normalized
    # deterministic
    out2 = f(_store_table())
    assert out.equals(out2)


def test_featurize_store_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_store_table(10)).repartition(3)
    out = multimodal.featurize_store(ds, concurrency=2, batch_size=4).to_pandas()
    assert len(out) == 10
    assert set(out.columns) == {"image_id", "w", "h", "fmt", "phash", "feature"}


def test_phash_near_dups_finds_identical_images(ray_session):
    # same pixels encoded twice → phash identical → pair at hamming 0
    iid = "00000000000000aa"
    arr = image_array(iid, 64, 64)
    t = pa.Table.from_pylist([
        {"image_id": "a", "bytes": encode_png(arr), "w": 64, "h": 64, "fmt": "png"},
        {"image_id": "b", "bytes": encode_png(arr), "w": 64, "h": 64, "fmt": "png"},
        {"image_id": "c", "bytes": image_bytes("00000000000000bb", 64, 64, "png"), "w": 64, "h": 64, "fmt": "png"},
    ])
    feats = multimodal.ImageFeaturizer()(t).to_pandas()
    pairs = multimodal.phash_near_dups(feats, max_hamming=2)
    assert ("a", "b") in set(zip(pairs["image_a"], pairs["image_b"]))
    assert not any("c" in p for p in zip(pairs["image_a"], pairs["image_b"]))


def test_codec_stubs_are_gated():
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(pa.table({}))
    with pytest.raises(NotImplementedError):
        multimodal.sample_video_frames(pa.table({}))
