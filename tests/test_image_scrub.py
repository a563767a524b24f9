"""PNG privacy scrub: chunk-level metadata removal (the image twin of the
text PII redaction) — roundtrip exactness, pixel preservation, malformed
rejection, idempotence."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from crawler_ray.imaging import (
    decode_png,
    encode_png,
    inject_test_metadata,
    png_audit,
    scrub_png,
)


def _img(seed: int = 3) -> bytes:
    rng = np.random.default_rng(seed)
    return encode_png(rng.integers(0, 256, (16, 12, 3), dtype=np.uint8))


def test_scrub_roundtrip_and_accounting():
    img = _img()
    aug = inject_test_metadata(img, "deadbeef01")
    assert png_audit(aug)["crc_ok"]          # injection writes valid chunks
    clean, nd, bd = scrub_png(aug)
    assert clean == img                       # byte-identical roundtrip
    assert nd == 3
    assert bd == (12 + 17 + 10) + (12 + 16) + (12 + 7)
    assert (decode_png(aug) == decode_png(clean)).all()


def test_scrub_is_identity_on_clean_png():
    img = _img(5)
    assert scrub_png(img) == (img, 0, 0)


def test_scrub_idempotent():
    aug = inject_test_metadata(_img(7), "cafe")
    clean, _, _ = scrub_png(aug)
    assert scrub_png(clean) == (clean, 0, 0)


def test_scrub_rejects_malformed():
    img = _img(9)
    with pytest.raises(ValueError):
        scrub_png(b"NOTAPNG" + img)
    with pytest.raises(ValueError):
        scrub_png(img[:-5])                  # truncated IEND
    # corrupt one CRC byte inside the injected tEXt chunk
    aug = bytearray(inject_test_metadata(img, "x"))
    ihdr_end = 8 + 12 + struct.unpack(">I", bytes(aug[8:12]))[0]
    text_len = struct.unpack(">I", bytes(aug[ihdr_end:ihdr_end + 4]))[0]
    crc_pos = ihdr_end + 8 + text_len
    aug[crc_pos] ^= 0xFF
    with pytest.raises(ValueError):
        scrub_png(bytes(aug))
    with pytest.raises(ValueError):
        scrub_png(inject_test_metadata(img, "x") + b"trailing")


def test_scrub_preserves_unknown_critical_order():
    # a PLTE chunk (critical) placed between IHDR and IDAT survives verbatim
    img = _img(11)
    ihdr_end = 8 + 12 + struct.unpack(">I", img[8:12])[0]
    plte = b"\x00\x00\x00" * 4
    chunk = (struct.pack(">I", len(plte)) + b"PLTE" + plte
             + struct.pack(">I", zlib.crc32(b"PLTE" + plte) & 0xFFFFFFFF))
    with_plte = img[:ihdr_end] + chunk + img[ihdr_end:]
    clean, nd, bd = scrub_png(inject_test_metadata(with_plte, "y"))
    assert clean == with_plte and nd == 3
