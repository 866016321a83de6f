"""Blind invisible watermark for generated images.

Parity with the reference's txt2img watermarking (txt2img.py:38-49,
put_watermark/WatermarkEncoder with the "StableDiffusionV1" payload —
there via the external invisible-watermark package). Here: a
self-contained blind DCT watermark — each payload bit is embedded in the
relation of two mid-frequency DCT coefficients of an 8x8 block of the
blue channel, repeated over blocks; decoding majority-votes. Robust to
PNG round-trips (lossless) and mild noise; like the reference's, it is
an *invisible provenance mark*, not a cryptographic one.
"""

from __future__ import annotations

import numpy as np
from scipy.fftpack import dct, idct

PAYLOAD = b"StableDiffusionV1"   # txt2img.py:345 wm text
_C1, _C2 = (3, 1), (1, 3)        # mid-frequency coefficient pair
_MARGIN = 6.0


def _bits(payload: bytes) -> np.ndarray:
    return np.unpackbits(np.frombuffer(payload, np.uint8))


def _dct2(a):
    return dct(dct(a, axis=0, norm="ortho"), axis=1, norm="ortho")


def _idct2(a):
    return idct(idct(a, axis=0, norm="ortho"), axis=1, norm="ortho")


def embed(img: np.ndarray, payload: bytes = PAYLOAD) -> np.ndarray:
    """img: (H, W, 3) uint8 -> watermarked uint8 (blue channel 8x8 DCT
    blocks carry the payload bits cyclically)."""
    bits = _bits(payload)
    out = img.astype(np.float32).copy()
    ch = out[..., 2]
    h, w = ch.shape
    idx = 0
    for by in range(0, h - 7, 8):
        for bx in range(0, w - 7, 8):
            block = _dct2(ch[by:by + 8, bx:bx + 8])
            bit = bits[idx % bits.size]
            a, b = block[_C1], block[_C2]
            # enforce a - b >= margin for 1, b - a >= margin for 0
            diff = a - b
            want = _MARGIN if bit else -_MARGIN
            if (diff - want) * (1 if bit else -1) < 0:
                mid = (a + b) / 2.0
                block[_C1] = mid + want / 2.0
                block[_C2] = mid - want / 2.0
            ch[by:by + 8, bx:bx + 8] = _idct2(block)
            idx += 1
    out[..., 2] = ch
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def decode(img: np.ndarray, n_bytes: int = len(PAYLOAD)) -> bytes:
    """Majority-vote the embedded bits back out of a watermarked image."""
    nbits = n_bytes * 8
    votes = np.zeros(nbits, np.float64)
    counts = np.zeros(nbits, np.int64)
    ch = img.astype(np.float32)[..., 2]
    h, w = ch.shape
    idx = 0
    for by in range(0, h - 7, 8):
        for bx in range(0, w - 7, 8):
            block = _dct2(ch[by:by + 8, bx:bx + 8])
            k = idx % nbits
            votes[k] += float(block[_C1] - block[_C2])
            counts[k] += 1
            idx += 1
    bits = (votes > 0).astype(np.uint8)
    return np.packbits(bits).tobytes()[:n_bytes]
