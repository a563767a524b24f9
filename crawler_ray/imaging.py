"""Image codec + perceptual hash, stdlib-only (zlib/struct + numpy).

Pillow is not available in this environment (SURVEY.md §7), so the store
table's ``bytes: binary`` column (BASELINE.json input_hint) is produced by
this module:

- ``encode_png``  — lossless RGB8 PNG (filter 0 scanlines, zlib), PSNR = ∞.
- ``encode_qpng`` — lossy test mode: uniform quantization (step ``q``) then
  PNG; constructed so decoded-pixel PSNR vs the original sits above the
  40 dB gate (q=6 → ≈43 dB) per the north rule.
- ``decode_png``  — chunk parse + inflate + defilter (filters 0–2, which is
  a superset of what the encoder emits).
- ``psnr``        — decoded-pixel fidelity check.
- ``phash64``     — 64-bit average-hash over an 8×8 block-mean downsample
  (the ``phash: int64`` store column; replaces the reference's
  sha256-of-url image naming, file_storage.py:279-293, with a
  content-derived perceptual key).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray, level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 array as a lossless PNG."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 RGB array")
    h, w = rgb.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = np.empty((h, 1 + w * 3), np.uint8)
    raw[:, 0] = 0  # filter type 0 (None) per scanline
    raw[:, 1:] = rgb.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def encode_qpng(rgb: np.ndarray, q: int = 6, level: int = 6) -> bytes:
    """Lossy mode: quantize to step ``q`` then PNG-encode (PSNR ≈ 43 dB @ q=6)."""
    quant = (np.round(rgb.astype(np.float32) / q) * q).clip(0, 255).astype(np.uint8)
    return encode_png(quant, level)


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG produced by this module (RGB8, filters 0–2) → (h, w, 3) uint8."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    try:
        while pos < len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            payload = data[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if tag == b"IHDR":
                w, hh, depth, ctype = struct.unpack(">IIBB", payload[:10])
                h = hh
                if depth != 8 or ctype != 2:
                    raise ValueError(f"unsupported PNG (depth={depth}, ctype={ctype})")
            elif tag == b"IDAT":
                idat.extend(payload)
            elif tag == b"IEND":
                break
    except struct.error as e:
        raise ValueError(f"truncated PNG: {e}") from e
    if w is None or h is None:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8).reshape(h, 1 + w * 3)
    filters = raw[:, 0]
    rows = raw[:, 1:].copy()
    if (filters > 2).any():
        raise ValueError("unsupported PNG filter type")
    stride = 3
    for y in range(h):
        f = filters[y]
        if f == 1:  # Sub
            row = rows[y]
            for x in range(stride, w * 3):
                row[x] = (int(row[x]) + int(row[x - stride])) & 0xFF
        elif f == 2 and y > 0:  # Up
            rows[y] = (rows[y].astype(np.int16) + rows[y - 1].astype(np.int16)).astype(np.uint8)
    return rows.reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical arrays)."""
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def _block_mean_8x8(gray: np.ndarray) -> np.ndarray:
    """Downsample (h, w) float array to 8×8 by block means (h, w ≥ 8)."""
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    integral = np.zeros((h + 1, w + 1), np.float64)
    integral[1:, 1:] = gray.cumsum(0).cumsum(1)
    sums = (
        integral[ys[1:, None], xs[None, 1:]]
        - integral[ys[:-1, None], xs[None, 1:]]
        - integral[ys[1:, None], xs[None, :-1]]
        + integral[ys[:-1, None], xs[None, :-1]]
    )
    areas = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    return sums / areas


def phash64(rgb: np.ndarray) -> int:
    """64-bit average-hash: 8×8 block means thresholded at their mean.

    Returns a SIGNED int64 (two's-complement view of the 64-bit pattern) to
    match the store schema ``phash: int64``.
    """
    gray = rgb.astype(np.float64).mean(axis=2)
    means = _block_mean_8x8(gray)
    bits = (means > means.mean()).flatten()
    value = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            value |= np.uint64(1) << np.uint64(i)
    return int(value.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two 64-bit phashes (signed int64 inputs ok)."""
    return int(bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1"))


def png_audit(data: bytes) -> dict:
    """Structural audit of one PNG blob WITHOUT decoding pixel data — the
    corrupted-blob detector a binary-column store runs as a data
    contract: signature, per-chunk CRC32 (the check ``decode_png``
    deliberately skips for speed), and the IHDR dims.

    Returns ``dict(sig_ok, crc_ok, w, h)`` with ``w = h = -1`` when no
    readable IHDR exists. ``crc_ok`` is False for truncated chunks,
    trailing garbage after IEND, or a missing IEND.
    """
    sig_ok = data[:8] == _PNG_SIG
    w = h = -1
    crc_ok = sig_ok
    pos = 8
    saw_iend = False
    while crc_ok and pos + 12 <= len(data):
        ln = struct.unpack(">I", data[pos:pos + 4])[0]
        tag = data[pos + 4:pos + 8]
        if pos + 12 + ln > len(data):
            crc_ok = False
            break
        chunk = data[pos + 8:pos + 8 + ln]
        crc = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])[0]
        if zlib.crc32(tag + chunk) & 0xFFFFFFFF != crc:
            crc_ok = False
            break
        if tag == b"IHDR" and ln >= 8:
            w, h = struct.unpack(">II", chunk[:8])
        pos += 12 + ln
        if tag == b"IEND":
            saw_iend = True
            break
    if crc_ok and (not saw_iend or pos != len(data)):
        crc_ok = False
    return dict(sig_ok=bool(sig_ok), crc_ok=bool(crc_ok), w=int(w), h=int(h))


def laplacian_var_ppm(rgb: np.ndarray) -> int:
    """Variance of the 4-neighbour Laplacian on an exact parts-per-million
    grid — the classic variance-of-Laplacian sharpness statistic
    (Pech-Pacheco et al., ICPR 2000) every large image-corpus quality
    filter applies: blurry images have low high-frequency response.

    Integer-exact by construction so the gate is bit-identical on any
    block layout or BLAS: the luminance proxy is the per-pixel CHANNEL SUM
    (r+g+b — no division, no rounding rule), the response is
    ``L = 4·g − g↑ − g↓ − g← − g→`` over interior pixels only (no padding
    convention to disagree about), and the variance is published as
    ``(n·Σx² − (Σx)²)·10⁶ // n²`` folded in overflow-free Python ints.
    """
    g = rgb.astype(np.int64).sum(axis=2)
    if g.shape[0] < 3 or g.shape[1] < 3:
        return 0
    core = g[1:-1, 1:-1]
    lap = 4 * core - g[:-2, 1:-1] - g[2:, 1:-1] - g[1:-1, :-2] - g[1:-1, 2:]
    n = int(lap.size)
    s = int(lap.sum())
    s2 = int((lap.astype(np.int64) ** 2).sum())
    return ((n * s2 - s * s) * 10**6) // (n * n)


# ---------------------------------------------------------------------------
# Privacy scrub: PNG metadata-chunk removal (the image twin of PII redaction)
# ---------------------------------------------------------------------------

# Everything needed to decode the pixels, nothing else. All ancillary
# chunks (tEXt/zTXt/iTXt/eXIf/tIME/pHYs/…) carry acquisition metadata —
# camera serials, GPS, timestamps, source URLs — that a training corpus
# must not retain (the image-side analogue of the text PII scrub).
CRITICAL_CHUNKS = frozenset((b"IHDR", b"PLTE", b"IDAT", b"IEND"))


def scrub_png(data: bytes) -> tuple[bytes, int, int]:
    """Drop every non-critical chunk from a PNG, byte-preserving the rest.

    Kept chunks are copied VERBATIM (length+tag+payload+crc slices), so a
    PNG that was already clean round-trips bit-identically. Returns
    ``(clean_bytes, n_chunks_dropped, bytes_dropped)``. Raises ValueError
    on a malformed stream (bad signature, truncated chunk, CRC mismatch)
    — scrubbing must never silently pass corrupt bytes downstream; the
    data-contract audit (``png_audit``) is the quarantine path.
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    out = [_PNG_SIG]
    n_dropped = 0
    bytes_dropped = 0
    pos = 8
    while pos + 12 <= len(data):
        ln = struct.unpack(">I", data[pos:pos + 4])[0]
        end = pos + 12 + ln
        if end > len(data):
            raise ValueError("truncated chunk")
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        crc = struct.unpack(">I", data[pos + 8 + ln:end])[0]
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError("chunk CRC mismatch")
        if tag in CRITICAL_CHUNKS:
            out.append(data[pos:end])
        else:
            n_dropped += 1
            bytes_dropped += 12 + ln
        pos = end
        if tag == b"IEND":
            break
    if pos != len(data):
        raise ValueError("trailing bytes after IEND")
    return b"".join(out), n_dropped, bytes_dropped


def inject_test_metadata(data: bytes, image_id: str) -> bytes:
    """Fixture augmentation for the scrub operator: insert the three
    deterministic ancillary chunks a real crawl's images would carry —
    a tEXt source comment (``Comment\\0image_id=<id>``), a 16-byte
    eXIf-shaped blob, and a 7-byte tIME stamp, all derived from the
    image id — right after IHDR. The payload-length formula is the
    published spec the golden recomputes independently:
    ``bytes_added = (12+17+len(id)) + (12+16) + (12+7)`` (the tEXt payload
    is the 17-byte ``Comment\\0image_id=`` prefix plus the id).
    """
    from crawler_ray.hashing import xxh64

    h = xxh64(image_id)
    text = b"Comment\x00image_id=" + image_id.encode()
    exif = struct.pack(">QQ", h, (h * 0x9E3779B185EBCA87) & (2**64 - 1))
    tim = struct.pack(">HBBBBB", 2025, 1 + h % 12, 1 + h % 28,
                      h % 24, h % 60, (h >> 8) % 60)
    extra = _chunk(b"tEXt", text) + _chunk(b"eXIf", exif) + _chunk(b"tIME", tim)
    ihdr_end = 8 + 12 + struct.unpack(">I", data[8:12])[0]
    return data[:ihdr_end] + extra + data[ihdr_end:]
