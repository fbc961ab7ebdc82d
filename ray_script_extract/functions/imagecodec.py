"""Pure-Python image codec: PNG (8-bit gray/RGB/RGBA, non-interlaced)
and binary PPM (P6) — no external imaging library exists in this
container, so the multimodal decode stage is implemented directly from
the public PNG (RFC 2083) and PNM specs.  The PNG row unfiltering is
shared with the PDF front-end's predictor support
(``sources.pdfnative._png_unpredict`` — same algorithm, same spec).

``encode_png`` exists so tests and the synthetic corpus can author
real payloads that round-trip through ``decode_image``.
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

import numpy as np

from ..sources.pdfnative import _png_unpredict

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> channels


def encode_png(arr: "np.ndarray") -> bytes:
    """(H, W) or (H, W, C) uint8 → minimal non-interlaced PNG."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[row].tobytes() for row in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _decode_png(payload: bytes) -> "np.ndarray":
    pos = len(_PNG_SIG)
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # incl. CRC
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise ValueError(f"PNG bit depth {depth} unsupported")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS.get(color_type)
            if channels is None:
                raise ValueError(f"PNG color type {color_type} unsupported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if width is None or channels is None:
        raise ValueError("malformed PNG: no IHDR")
    raw = zlib.decompress(bytes(idat))
    flat = _png_unpredict(raw, colors=channels, bpc=8, columns=width)
    arr = np.frombuffer(flat[:height * width * channels], dtype=np.uint8)
    return arr.reshape(height, width, channels)


def _decode_ppm(payload: bytes) -> "np.ndarray":
    # P6 header: magic, width, height, maxval (whitespace/comments)
    tokens = []
    pos = 2
    while len(tokens) < 3 and pos < len(payload):
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    arr = np.frombuffer(payload[pos:pos + w * h * 3], dtype=np.uint8)
    return arr.reshape(h, w, 3)


def decode_image(payload: bytes) -> "np.ndarray":
    """Image bytes → (H, W, C) uint8.  PNG, binary PPM, baseline JPEG
    (T.81 — the payload a PDF ``/DCTDecode`` XObject carries) and
    single-strip G4 TIFF (the self-describing wrap the PDF front-end
    stores for ``/CCITTFaxDecode`` XObjects) supported; anything else
    raises ValueError (the caller decides whether to fall back to a
    hash feature)."""
    if payload.startswith(_PNG_SIG):
        return _decode_png(payload)
    if payload.startswith(b"P6"):
        return _decode_ppm(payload)
    if payload.startswith(b"\xff\xd8"):
        from .jpegcodec import decode_jpeg
        return decode_jpeg(payload)
    if payload.startswith(b"II*\x00"):
        from .faxcodec import decode_tiff_g4
        return decode_tiff_g4(payload)
    raise ValueError("unsupported image format")


def image_stats_feature(arr: "np.ndarray", dim: int) -> "np.ndarray":
    """Deterministic pixel-statistics feature vector: shape, per-
    channel mean/std, 16-bin intensity histogram — padded/truncated to
    ``dim`` and L2-normalized.  Stands in for a model embedding while
    being a REAL function of the decoded pixels."""
    h, w, c = arr.shape
    gray = arr.mean(axis=2)
    hist, _ = np.histogram(gray, bins=16, range=(0, 256))
    parts = [
        np.array([h, w, c], dtype=np.float64),
        arr.reshape(-1, c).mean(axis=0),
        arr.reshape(-1, c).std(axis=0),
        hist.astype(np.float64) / max(1, h * w),
    ]
    vec = np.concatenate(parts)
    if len(vec) < dim:
        vec = np.concatenate([vec, np.zeros(dim - len(vec))])
    vec = vec[:dim]
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def resize_nearest(arr: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":
    """Nearest-neighbor resize of an (H, W, C) uint8 image — the
    standard model-input preprocessing step, pure numpy (source pixel
    = floor(i * in/out), the classic nearest mapping)."""
    import numpy as np

    h, w = arr.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[rows][:, cols]
