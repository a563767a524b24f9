"""xxh64: public test vectors + scalar/vector agreement."""

import numpy as np
import pandas as pd
import pyarrow as pa

from crawler_ray.hashing import xxh64, xxh64_array

# Published XXH64 vectors (xxHash project documentation / spec).
KNOWN = [
    (b"", 0, 0xEF46DB3751D8E999),
    (b"a", 0, 0xD24EC4F1A98C6E5B),
    (b"abc", 0, 0x44BC2CF5AD770999),
    (b"xxhash", 0, 0x32DD38952C4BC720),
    (b"xxhash", 20141025, 0xB559B98D844E0635),
]


def test_known_vectors():
    for data, seed, want in KNOWN:
        assert xxh64(data, seed) == want, data


def test_vector_matches_scalar_fuzz():
    rng = np.random.default_rng(42)
    blobs = [bytes(rng.integers(0, 256, int(rng.integers(0, 300)), dtype=np.uint8)) for _ in range(1000)]
    # make sure every tail-length class 0..31 and multi-stripe lengths appear
    blobs += [b"x" * n for n in range(70)]
    got = xxh64_array(blobs)
    want = np.array([xxh64(b) for b in blobs], dtype=np.uint64)
    assert (got == want).all()


def test_vector_seeded_and_inputs():
    urls = ["https://a.example.org/x", "https://b.example.org/y/z", ""]
    want = [xxh64(u, 7) for u in urls]
    for col in (urls, pd.Series(urls), pa.array(urls), pa.chunked_array([urls[:1], urls[1:]])):
        assert xxh64_array(col, seed=7).tolist() == want


def test_unicode_utf8():
    s = "héllo wörld ünïcode 中文"
    assert xxh64_array([s])[0] == xxh64(s.encode("utf-8"))


def test_nulls_hash_as_empty():
    arr = pa.array(["a", None, "b"])
    got = xxh64_array(arr)
    assert got[1] == xxh64(b"")


def test_sliced_arrow_array():
    arr = pa.array(["aa", "bb", "cc", "dd"]).slice(1, 2)
    assert xxh64_array(arr).tolist() == [xxh64("bb"), xxh64("cc")]
