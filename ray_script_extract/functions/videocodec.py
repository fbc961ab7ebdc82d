"""Toy video container: RAWV = concatenated P6 PPM frames.

Real video codecs (H.264 etc.) are out of scope for this container —
per the engine's multimodal contract the DECODE of production formats
is stubbed while the Ray-side plumbing (schema, actor signature,
batching, frame sampling) is real.  RAWV is the honest middle: a
fully-specified, fully-decodable container (``RAWV`` magic, uint32-BE
frame count, then each frame as a standard binary PPM), so the
frame-sample stage exercises real parsing and real per-frame pixel
math rather than a hash.  Swapping in a production decoder only
replaces ``decode_rawv``.
"""

from __future__ import annotations

import struct
from typing import List

import numpy as np

from .imagecodec import _decode_ppm

_MAGIC = b"RAWV"


def encode_rawv(frames: "List[np.ndarray]") -> bytes:
    """Pack (H, W, 3) uint8 frames as magic + count + P6 PPMs."""
    parts = [_MAGIC, struct.pack(">I", len(frames))]
    for f in frames:
        if f.dtype != np.uint8 or f.ndim != 3 or f.shape[2] != 3:
            raise ValueError("RAWV frames must be (H, W, 3) uint8")
        h, w = f.shape[:2]
        parts.append(b"P6\n%d %d\n255\n" % (w, h) + f.tobytes())
    return b"".join(parts)


def decode_rawv(payload: bytes, frame_step: int = 1
                ) -> "List[np.ndarray]":
    """Decode every ``frame_step``-th frame (frame sampling happens at
    the container level: skipped frames are seeked over, not decoded —
    the property that makes sampling worth doing at scale)."""
    if payload[:4] != _MAGIC:
        raise ValueError("not a RAWV payload")
    (n_frames,) = struct.unpack(">I", payload[4:8])
    pos = 8
    out: List[np.ndarray] = []
    for idx in range(n_frames):
        if payload[pos:pos + 3] != b"P6\n":
            raise ValueError("corrupt RAWV frame header")
        hdr_end = payload.index(b"\n", payload.index(b"\n", pos + 3) + 1) + 1
        dims = payload[pos + 3:hdr_end].split()
        w, h = int(dims[0]), int(dims[1])
        body_end = hdr_end + h * w * 3
        if idx % frame_step == 0:
            out.append(_decode_ppm(payload[pos:body_end]))
        pos = body_end
    return out
