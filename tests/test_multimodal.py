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


def test_feature_near_dups_tile_grid(ray_session):
    """Planted near-identical feature pair survives; dissimilar pair does
    not; string ids round-trip through the hashed tile grid + joins."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    base = np.abs(rng.normal(size=64))
    near = base + rng.normal(scale=1e-4, size=64)
    far = np.abs(rng.normal(size=64))
    rows = []
    for iid, v in (("img-a", base), ("img-b", near), ("img-c", far)):
        v = (v / np.linalg.norm(v)).astype(np.float32)
        rows.append({"image_id": iid, "feature": v.tolist()})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(2)
    out = multimodal.feature_near_dups(ds, threshold=0.999)
    assert list(zip(out["image_a"], out["image_b"])) == [("img-a", "img-b")]
    assert (out["sim"] >= 0.999).all()


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


def test_wav_codec_roundtrip_and_stdlib_parity():
    """Engine WAV chunk-walker == stdlib `wave` on the same payload, and
    survives an inserted extra chunk (real parsers tolerate LIST etc.)."""
    import io
    import struct
    import wave

    from crawler_ray.sources import synthetic_media as sm

    data = sm.audio_wav_bytes("clip-1", 7)
    sr, x = sm.decode_wav(data)
    with wave.open(io.BytesIO(data)) as w:
        assert (w.getframerate(), w.getnframes()) == (sr, len(x))
        ref = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    assert np.array_equal(x, ref)
    # insert a LIST chunk between fmt and data: still decodes identically
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    sr2, x2 = sm.decode_wav(data[:fmt_end] + extra + data[fmt_end:])
    assert sr2 == sr and np.array_equal(x2, x)


def test_media_decoders_reject_malformed():
    from crawler_ray.sources import synthetic_media as sm

    with pytest.raises(ValueError):
        sm.decode_wav(b"RIFFxxxxJUNK")
    with pytest.raises(ValueError):
        sm.decode_wav(sm.audio_wav_bytes("c", 1)[:30])  # truncated
    with pytest.raises(ValueError):
        sm.read_video_container(b"NOPE" + b"\x00" * 20)
    good = sm.video_bytes("v", 1)
    with pytest.raises(ValueError):
        sm.read_video_container(good[:-3])  # truncated last frame


def test_audio_video_stages_over_dataset(ray_session):
    """Actor-pool plumbing end-to-end: binary column in, typed rows out."""
    import ray.data as rd

    from crawler_ray.sources import synthetic_media as sm

    audio = rd.from_items([{"audio_id": f"a{i}", "bytes": sm.audio_wav_bytes(f"a{i}", 9)}
                           for i in range(6)]).repartition(3)
    feats = multimodal.featurize_audio(audio).to_pandas()
    assert len(feats) == 6 and (feats["sample_rate"] == sm.AUDIO_SR).all()
    assert (feats["rms"] > 0).all() and (feats["dominant_hz"] > 0).all()

    video = rd.from_items([{"video_id": f"v{i}", "bytes": sm.video_bytes(f"v{i}", 9)}
                           for i in range(3)]).repartition(2)
    frames = multimodal.video_frames(video, every_n=4).to_pandas()
    assert (frames["frame_idx"] % 4 == 0).all() and (frames["w"] == 24).all()
    # every video contributes its frame 0 and a deterministic frame count
    n0, _, f0 = sm.read_video_container(sm.video_bytes("v0", 9))
    assert len(frames.loc[frames["video_id"] == "v0"]) == len(range(0, n0, 4))


def test_resize_rgb_matches_naive_box_filter():
    """Integral-image box resize == explicit per-block means (exact: uint8
    block sums are exact integers in float64)."""
    from crawler_ray.pipelines.multimodal import resize_rgb

    rng = np.random.default_rng(31)
    rgb = rng.integers(0, 256, (50, 37, 3), np.uint8)
    got = resize_rgb(rgb, 12, 9)
    for i in range(12):
        y0, y1 = (i * 50) // 12, ((i + 1) * 50) // 12
        for j in range(9):
            x0, x1 = (j * 37) // 9, ((j + 1) * 37) // 9
            for c in range(3):
                want = np.uint8(np.clip(np.rint(
                    rgb[y0:y1, x0:x1, c].astype(np.float64).mean()), 0, 255))
                assert got[i, j, c] == want
    # constant image stays constant under resize
    const = np.full((40, 40, 3), 123, np.uint8)
    assert (resize_rgb(const, 8, 8) == 123).all()


def test_image_resizer_roundtrip(ray_session):
    """Actor-pool thumbnail stage: aspect preserved, no upscaling, min
    side clamped to 8, thumbnails decode back to the resize output."""
    import pyarrow as pa

    from crawler_ray.imaging import decode_png, encode_png
    from crawler_ray.pipelines.multimodal import ImageResizer, resize_rgb

    rng = np.random.default_rng(32)
    big = rng.integers(0, 256, (96, 64, 3), np.uint8)
    small = rng.integers(0, 256, (20, 24, 3), np.uint8)
    batch = pa.table({
        "image_id": pa.array(["big", "small"]),
        "bytes": pa.array([encode_png(big), encode_png(small)], pa.binary()),
        "w": pa.array([64, 24], pa.int32()), "h": pa.array([96, 20], pa.int32()),
        "fmt": pa.array(["png", "png"]),
    })
    out = ImageResizer(max_side=32)(batch).to_pylist()
    by_id = {r["image_id"]: r for r in out}
    assert (by_id["big"]["h"], by_id["big"]["w"]) == (32, 21)
    assert (by_id["small"]["h"], by_id["small"]["w"]) == (20, 24)  # no upscale
    thumb = decode_png(by_id["big"]["bytes"])
    assert (thumb == resize_rgb(big, 32, 21)).all()


def test_audio_near_dup_pairs_planted(ray_session):
    """A re-mastered twin (gain + dither) is found; unrelated clips are not."""
    from crawler_ray.sources.synthetic_media import (
        audio_features, audio_wav_bytes, near_dup_audio_bytes)

    clips = {"c0": audio_wav_bytes("c0", 7), "c0x": near_dup_audio_bytes("c0", 7),
             "c1": audio_wav_bytes("c1", 7), "c2": audio_wav_bytes("c2", 7)}
    rows = []
    for k, data in clips.items():
        f = audio_features(data)
        rows.append({"audio_id": k, "n_samples": f["n_samples"],
                     "rms": round(f["rms"], 6), "zcr": round(f["zcr"], 6),
                     "dominant_hz": round(f["dominant_hz"], 3)})
    out = multimodal.audio_near_dup_pairs(pd.DataFrame(rows))
    assert list(out["audio_a"]) == ["c0"] and list(out["audio_b"]) == ["c0x"]
    assert (out["d_rms"] <= 0.02).all()


def test_audio_grid_boundary_pair_not_missed(ray_session):
    """Two clips whose dominant frequencies straddle a grid-cell boundary
    (cells 0 and 1 at width 4.0) still meet via ghost replication."""
    rows = pd.DataFrame([
        {"audio_id": "lo", "n_samples": 4000, "rms": 0.30, "zcr": 0.10, "dominant_hz": 3.9},
        {"audio_id": "hi", "n_samples": 4000, "rms": 0.31, "zcr": 0.11, "dominant_hz": 4.1},
        # same features but different length: must NOT pair
        {"audio_id": "otherlen", "n_samples": 4001, "rms": 0.30, "zcr": 0.10, "dominant_hz": 3.9},
    ])
    out = multimodal.audio_near_dup_pairs(rows)
    assert list(zip(out["audio_a"], out["audio_b"])) == [("hi", "lo")]


def test_video_shared_phash_pairs_recut(ray_session):
    """A re-cut (offset = sampling stride) shares the original's sampled
    frames; the shared count matches a brute-force set intersection, and
    an unrelated video pairs with neither."""
    import ray.data as rd

    from crawler_ray.imaging import decode_png, phash64
    from crawler_ray.sources.synthetic_media import (
        read_video_container, recut_video_bytes, video_bytes)

    vids = {"vd": video_bytes("vd", 3), "vdx": recut_video_bytes("vd", 3),
            "vb": video_bytes("vb", 3)}
    n0, _, _ = read_video_container(vids["vd"])
    assert n0 >= 12, "fixture video too short for a >=2-shared-frame re-cut"
    rows, sets = [], {}
    for k, data in vids.items():
        n, _, frames = read_video_container(data)
        hs = [int(phash64(decode_png(frames[i]))) for i in range(0, n, 4)]
        sets[k] = set(hs)
        # phash64 may come back as a signed int64 scalar; mask to the
        # uint64 domain (np.uint64(negative) became an error on numpy 2.x)
        rows += [{"video_id": k, "phash": np.uint64(h & (2**64 - 1))} for h in hs]
    frames_ds = rd.from_pandas(pd.DataFrame(rows)).repartition(3)
    out = multimodal.video_shared_phash_pairs(frames_ds, min_shared=2)
    expect = len(sets["vd"] & sets["vdx"])
    assert expect >= 2
    got = {(a, b): s for a, b, s in zip(out["video_a"], out["video_b"], out["shared"])}
    assert got.get(("vd", "vdx")) == expect
    assert ("vb", "vd") not in got and ("vb", "vdx") not in got


def test_video_shared_phash_hot_bucket_capped(ray_session):
    """A stop-word frame hash shared by > max_group videos is dropped
    instead of exploding quadratically."""
    rows = pd.DataFrame({
        "video_id": [f"v{i}" for i in range(10)] + ["p", "q", "p", "q"],
        "phash": [np.uint64(777)] * 10 + [np.uint64(1), np.uint64(1),
                                          np.uint64(2), np.uint64(2)],
    })
    out = multimodal.video_shared_phash_pairs(rows, min_shared=2, max_group=4)
    assert list(zip(out["video_a"], out["video_b"], out["shared"])) == [("p", "q", 2)]


def test_ann_merge_dedups_duplicate_store_images():
    """Duplicate stored images (same image_id from several pages) produce
    duplicate (qid, vid, sim) partial rows; the image_ann_topk merge must
    drop them so they cannot crowd the k-th DISTINCT neighbour out of the
    top-k."""
    import pandas as pd

    from crawler_ray.functions.ann import merge_topk

    g = pd.DataFrame({
        "qid": [1] * 7,
        "vid": [10, 10, 10, 11, 12, 13, 14],     # vid 10 stored 3 times
        "sim": [0.9, 0.9, 0.9, 0.8, 0.7, 0.6, 0.5],
    })
    merged = merge_topk(g.drop_duplicates("vid"), 5)
    assert merged["vid"].tolist() == [10, 11, 12, 13, 14]
    naive = merge_topk(g, 5)                      # without dedup: 14 crowded out
    assert 14 not in naive["vid"].tolist()
