"""Minimal deterministic PCM audio container ("QAUD") + codec seam.

The multimodal contract treats audio like images: an opaque ``binary``
cell plus typed metadata, decoded ONLY inside Arrow batches. Real audio
libs (soundfile, librosa, av) are absent from this sandbox (BENCH.md
"Environment attempts"), so the engine ships an honest stand-in format
the synth source can produce and the decode seam a real codec drops into:

    QAUD := b"QAUD" | u32 sample_rate | u32 n_samples | i16 samples (LE)

Mono 16-bit PCM — enough surface to make duration / RMS / silence /
clipping analysis real. ``decode_audio`` is the single swap point for a
soundfile-backed decoder (same return contract).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"QAUD"
_HEADER = struct.Struct("<4sII")


def encode_qaud(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → QAUD bytes."""
    s = np.asarray(samples, dtype="<i2")
    return _HEADER.pack(MAGIC, int(sample_rate), len(s)) + s.tobytes()


def decode_audio(data: bytes) -> tuple[int, np.ndarray]:
    """QAUD bytes → (sample_rate, int16 samples). Raises ValueError on
    anything malformed — callers map that to (ok=False, reason)."""
    if data is None or len(data) < _HEADER.size:
        raise ValueError("audio_truncated_header")
    magic, rate, n = _HEADER.unpack_from(data)
    if magic != MAGIC:
        raise ValueError("audio_bad_magic")
    if rate <= 0:
        raise ValueError("audio_bad_rate")
    body = data[_HEADER.size:]
    if len(body) != 2 * n:
        raise ValueError("audio_truncated_body")
    return rate, np.frombuffer(body, dtype="<i2")


def synth_audio(seed: int, sample_rate: int = 16000, seconds: float = 0.25) -> bytes:
    """Deterministic test tone: a seeded mix of two sines + noise floor.
    Same seed → identical bytes on every host/partitioning."""
    rng = np.random.default_rng(seed)
    n = int(sample_rate * seconds)
    t = np.arange(n) / sample_rate
    f1, f2 = 200 + (seed % 17) * 40, 1000 + (seed % 7) * 150
    wave = 0.55 * np.sin(2 * np.pi * f1 * t) + 0.25 * np.sin(2 * np.pi * f2 * t)
    wave += 0.01 * rng.standard_normal(n)
    return encode_qaud(np.clip(wave, -1, 1) * 32767, sample_rate)
