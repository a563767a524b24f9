"""Binary-column data contract: png_audit kernel + image_audit_stats
detection on planted corruptions (each on its own host so the per-host
rollup isolates every case)."""
import numpy as np
import pyarrow as pa

from crawler_ray.imaging import decode_png, encode_png, phash64, png_audit


def _img(seed: int, h: int = 12, w: int = 10) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                                dtype=np.uint8)


def test_png_audit_accepts_own_encoder():
    rgb = _img(1)
    a = png_audit(encode_png(rgb))
    assert a == dict(sig_ok=True, crc_ok=True, w=10, h=12)


def test_png_audit_rejects_corruptions():
    data = encode_png(_img(2))
    # bad signature
    assert png_audit(b"JUNK" + data[4:])["sig_ok"] is False
    # flipped byte inside the IDAT payload breaks that chunk's CRC
    idat = data.find(b"IDAT")
    flipped = bytearray(data)
    flipped[idat + 10] ^= 0xFF
    assert png_audit(bytes(flipped))["crc_ok"] is False
    # truncation (mid-chunk)
    assert png_audit(data[:-20])["crc_ok"] is False
    # trailing garbage after IEND
    assert png_audit(data + b"xx")["crc_ok"] is False
    # missing IEND entirely
    assert png_audit(data[:8])["crc_ok"] is False


def test_image_audit_stats_detects_planted_rows(ray_session):
    import ray.data as rd

    from crawler_ray.pipelines.multimodal import image_audit_stats

    def row(host, rgb, **over):
        data = over.pop("data", encode_png(rgb))
        r = dict(image_id=f"{host}-img", bytes=data,
                 w=rgb.shape[1], h=rgb.shape[0],
                 phash=phash64(rgb), host=host)
        r.update(over)
        return r

    good = _img(3)
    bad_crc = bytearray(encode_png(_img(4)))
    bad_crc[bad_crc.index(b"IDAT") + 9] ^= 0x01  # CRC now stale
    rows = [
        row("h-good", good),
        row("h-sig", _img(5), data=b"NOTAPNG!" + encode_png(_img(5))[8:]),
        row("h-dims", _img(6), w=999),
        row("h-phash", _img(7), phash=phash64(_img(7)) ^ 1),
        row("h-trunc", _img(8), data=encode_png(_img(8))[:-15]),
        row("h-crc", _img(4), data=bytes(bad_crc)),
    ]
    out = image_audit_stats(
        rd.from_arrow(pa.Table.from_pylist(rows))).set_index("host")

    assert out.loc["h-good"].tolist() == [1, 0, 0, 0, 0, 0]
    assert out.loc["h-sig", "n_sig_bad"] == 1
    assert out.loc["h-dims", "n_dims_bad"] == 1
    assert out.loc["h-phash", "n_phash_bad"] == 1
    assert out.loc["h-phash", "n_decode_err"] == 0
    assert out.loc["h-trunc", "n_crc_bad"] == 1
    assert out.loc["h-crc", "n_crc_bad"] == 1
    # phash/decode rules are disjoint: a decode failure never also counts
    # as a phash mismatch
    assert (out["n_decode_err"] + out["n_phash_bad"] <= out["n_images"]).all()
