"""Deterministic synthetic audio / video payloads + REAL codecs.

The brief's multimodal requirement: treat audio/video as opaque binary
columns and make the decode / feature-extract / frame-sample stages real.
The container has no media libraries, so both formats here are fully
self-implemented from their public specs with numpy only:

- audio: canonical 44-byte RIFF/WAVE PCM16 mono files
  (`audio_wav_bytes`), decoded by a real chunk-walking parser
  (`decode_wav`) that validates magics and chunk bounds — it decodes any
  spec-conforming PCM16 mono WAV, not just its own output.
- video: an explicit length-prefixed PNG-frame container (`RVID`:
  magic, u32 n_frames, fps, then per frame u32 length + PNG bytes),
  reusing the repo's pure-numpy PNG codec (crawler_ray/imaging.py) for
  the frames. Real videos would swap the frame codec, not the plumbing.

Everything is FUNCTIONAL: bytes derive from (key, seed) on demand via
xxh64, the same design as sources/synthetic_web.py — nothing media-sized
is broadcast or stored ahead of time.
"""

from __future__ import annotations

import struct

import numpy as np

from crawler_ray.hashing import xxh64
from crawler_ray.imaging import encode_png

AUDIO_SR = 8000

VIDEO_MAGIC = b"RVID"


def _u(key: str, seed: int, salt: str) -> int:
    return xxh64(f"{salt}|{key}", seed)


# ---------------------------------------------------------------------------
# Audio — RIFF/WAVE PCM16 mono
# ---------------------------------------------------------------------------

def synth_audio_samples(key: str, seed: int) -> np.ndarray:
    """Deterministic int16 sample stream: a 2-tone sine mixture whose
    frequencies, amplitude and duration derive from (key, seed)."""
    u = _u(key, seed, "audio")
    n = AUDIO_SR // 4 + (u % (AUDIO_SR // 2))            # 0.25-0.75 s
    f1 = 100.0 + ((u >> 8) % 1900)                       # 100-2000 Hz
    f2 = 100.0 + ((u >> 24) % 1900)
    amp = 0.3 + ((u >> 40) % 1000) / 2000.0              # 0.3-0.8
    t = np.arange(n, dtype=np.float64) / AUDIO_SR
    x = amp * (0.7 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t))
    return np.clip(x * 32767.0, -32768, 32767).astype(np.int16)


def wav_encode(samples: np.ndarray, sample_rate: int = AUDIO_SR) -> bytes:
    """Spec-canonical RIFF/WAVE container for PCM16 mono samples."""
    data = np.asarray(samples, np.int16).tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                   sample_rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def audio_wav_bytes(key: str, seed: int) -> bytes:
    return wav_encode(synth_audio_samples(key, seed))


def near_dup_audio_bytes(key: str, seed: int, gain: float = 0.97) -> bytes:
    """A NEAR-duplicate of ``audio_wav_bytes(key, seed)``: the same sample
    stream re-mastered with a small gain change plus a deterministic ±30-LSB
    dither — the "same recording, different encode" shape real corpora have.
    Every feature moves slightly (RMS by the gain, ZCR by sign flips near
    zeros) while the clip length and dominant frequency are preserved."""
    x = synth_audio_samples(key, seed).astype(np.float64)
    u = _u(key, seed, "dither")
    # Weyl-sequence dither: deterministic, zero-mean-ish, ±30 LSB
    d = ((((np.arange(len(x), dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + np.uint64(u)) >> np.uint64(32)) % 61).astype(np.float64) - 30.0)
    y = np.clip(x * gain + d, -32768, 32767).astype(np.int16)
    return wav_encode(y)


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Real RIFF chunk walker for PCM16 mono WAV: validates magics, walks
    chunks (tolerating extras like LIST), returns (sample_rate, int16
    samples). Raises ValueError on malformed input."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, sr, samples = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated chunk")
        if tag == b"fmt ":
            fmt, ch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if (fmt, ch, bits) != (1, 1, 16):
                raise ValueError(f"unsupported WAV format {(fmt, ch, bits)}")
        elif tag == b"data":
            samples = np.frombuffer(body, np.int16)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return int(sr), samples


def audio_features(data: bytes) -> dict:
    """Decode + feature-extract one WAV payload: duration, RMS level,
    zero-crossing rate, dominant frequency (rFFT argmax)."""
    sr, x = decode_wav(data)
    f = x.astype(np.float64) / 32768.0
    n = len(f)
    rms = float(np.sqrt(np.mean(f * f))) if n else 0.0
    zcr = float(np.mean(np.signbit(f[1:]) != np.signbit(f[:-1]))) if n > 1 else 0.0
    if n > 1:
        spec = np.abs(np.fft.rfft(f))
        dom = float(np.argmax(spec) * sr / n)
    else:
        dom = 0.0
    return {"sample_rate": sr, "n_samples": n, "duration_s": n / sr,
            "rms": rms, "zcr": zcr, "dominant_hz": dom}


# ---------------------------------------------------------------------------
# Video — RVID length-prefixed PNG-frame container
# ---------------------------------------------------------------------------

def synth_video_frame(key: str, seed: int, idx: int, size: int = 24) -> np.ndarray:
    """Deterministic RGB frame: a gradient whose phase ADVANCES with the
    frame index, so consecutive frames differ (motion) and phashes move."""
    u = _u(key, seed, "video")
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    phase = (u % 256) / 40.0 + idx * 0.7
    r = 127.5 * (1 + np.sin(xx / 3.0 + phase))
    g = 127.5 * (1 + np.cos(yy / 4.0 + phase * 0.5))
    b = ((xx + yy) * 4 + idx * 16) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def encode_video_container(frame_pngs: list[bytes], fps: int) -> bytes:
    """Assemble an RVID container from already-encoded PNG frames."""
    out = [VIDEO_MAGIC, struct.pack("<II", len(frame_pngs), fps)]
    for png in frame_pngs:
        out.append(struct.pack("<I", len(png)))
        out.append(png)
    return b"".join(out)


def video_bytes(key: str, seed: int, size: int = 24) -> bytes:
    """Deterministic RVID container: 4-32 frames keyed by (key, seed)."""
    u = _u(key, seed, "vmeta")
    n_frames = 4 + (u % 29)
    fps = 4 + ((u >> 16) % 27)
    return encode_video_container(
        [encode_png(synth_video_frame(key, seed, i, size)) for i in range(n_frames)],
        fps)


def recut_video_bytes(key: str, seed: int, offset: int = 4, size: int = 24) -> bytes:
    """A "re-cut" of ``video_bytes(key, seed)``: the same footage starting
    ``offset`` frames in (frame j of the re-cut is frame j+offset of the
    original), same fps — the trimmed-reupload shape video dedup targets.
    With offset a multiple of the frame-sampling stride, the re-cut's
    sampled frames are pixel-identical to sampled frames of the original."""
    u = _u(key, seed, "vmeta")
    n_frames = 4 + (u % 29)
    fps = 4 + ((u >> 16) % 27)
    n2 = max(n_frames - offset, 2)
    return encode_video_container(
        [encode_png(synth_video_frame(key, seed, i + offset, size)) for i in range(n2)],
        fps)


def read_video_container(data: bytes) -> tuple[int, int, list[bytes]]:
    """Parse an RVID container → (n_frames, fps, frame PNG payloads).
    Raises ValueError on bad magic / truncation / frame-count mismatch."""
    if len(data) < 12 or data[:4] != VIDEO_MAGIC:
        raise ValueError("not an RVID container")
    n_frames, fps = struct.unpack("<II", data[4:12])
    pos, frames = 12, []
    for _ in range(n_frames):
        if pos + 4 > len(data):
            raise ValueError("truncated frame table")
        (ln,) = struct.unpack("<I", data[pos:pos + 4])
        frame = data[pos + 4:pos + 4 + ln]
        if len(frame) < ln:
            raise ValueError("truncated frame payload")
        frames.append(frame)
        pos += 4 + ln
    if pos != len(data):
        raise ValueError("trailing bytes after last frame")
    return n_frames, fps, frames
