"""Pure-Python WAV (RIFF PCM) codec + audio features — the audio leg
of the multimodal pipeline, written from the public RIFF/WAVE spec (no
audio library exists in this container).  16-bit PCM mono/stereo.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


def encode_wav(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """int16 samples, (n,) mono or (n, 2) stereo → RIFF/WAVE bytes."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    data = samples.tobytes()
    byte_rate = rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate,
                      channels * 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> Tuple["np.ndarray", int]:
    """RIFF/WAVE bytes → ((n,) or (n, channels) int16, sample rate).
    Only uncompressed 16-bit PCM is supported."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = channels = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        chunk = payload[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", chunk[:16])
            if fmt_code != 1 or bits != 16:
                raise ValueError("only 16-bit PCM WAV supported")
        elif tag == b"data":
            data = chunk
    if rate is None or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if channels and channels > 1:
        samples = samples[:len(samples) - len(samples) % channels] \
            .reshape(-1, channels)
    return samples, rate


def audio_stats_feature(samples: "np.ndarray", rate: int,
                        dim: int) -> "np.ndarray":
    """Deterministic audio feature: duration, RMS, zero-crossing rate,
    and an 8-band coarse magnitude spectrum — padded to ``dim`` and
    L2-normalized.  A real function of the decoded waveform."""
    mono = samples.astype(np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    n = len(mono)
    if n == 0:
        return np.zeros(dim)
    rms = float(np.sqrt((mono ** 2).mean()))
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(mono))
    bands = np.array_split(spec, 8)
    band_e = np.array([b.mean() if len(b) else 0.0 for b in bands])
    vec = np.concatenate([[n / rate, rms, zcr], band_e])
    if len(vec) < dim:
        vec = np.concatenate([vec, np.zeros(dim - len(vec))])
    vec = vec[:dim]
    norm = np.linalg.norm(vec)
    return vec / norm if norm > 0 else vec
