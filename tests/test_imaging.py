"""PNG codec, PSNR gate, phash (store-table invariants, FIXTURES.md F4/F5)."""

import numpy as np
import pytest

from crawler_ray.imaging import decode_png, encode_png, encode_qpng, hamming64, phash64, psnr


@pytest.fixture
def img():
    return np.random.default_rng(11).integers(0, 256, (64, 64, 3), dtype=np.uint8)


def test_lossless_roundtrip(img):
    assert (decode_png(encode_png(img)) == img).all()
    assert psnr(img, decode_png(encode_png(img))) == float("inf")


def test_lossy_psnr_gate(img):
    decoded = decode_png(encode_qpng(img, q=6))
    assert 40.0 <= psnr(img, decoded) < 50.0  # sits just above the 40 dB gate


def test_lossy_too_coarse_fails_gate(img):
    decoded = decode_png(encode_qpng(img, q=40))
    assert psnr(img, decoded) < 40.0


def test_non_square_and_odd_sizes():
    rng = np.random.default_rng(5)
    for shape in [(8, 8), (9, 13), (64, 17), (100, 100)]:
        a = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        assert (decode_png(encode_png(a)) == a).all()
        assert isinstance(phash64(a), int)


def test_phash_determinism_and_robustness(img):
    h1 = phash64(img)
    assert h1 == phash64(img.copy())
    assert np.int64(h1) is not None  # fits int64
    # lossy re-encode barely moves the phash
    h2 = phash64(decode_png(encode_qpng(img, q=6)))
    assert hamming64(h1, h2) <= 4
    # a very different image is far away
    other = np.random.default_rng(999).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    smooth = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (64, 1))[:, :, None].repeat(3, 2)
    assert hamming64(phash64(smooth), h1) > 8 or hamming64(phash64(other), phash64(smooth)) > 8


def test_bad_png_rejected():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
