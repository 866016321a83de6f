"""Native (C++) runtime components, reached via ctypes.

Compiled lazily with the system toolchain on first use and cached next
to the source; every consumer has a pure-Python fallback so the
framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", out, src, "-lz",
           "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("fastpng build failed (%s); using PIL fallback", e)
        return False


def load_fastpng() -> Optional[ctypes.CDLL]:
    """The fastpng shared library, building it on demand; None if the
    toolchain is unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_DIR, "fastpng.cpp")
        so = os.path.join(_DIR, "libfastpng.so")
        if not os.path.exists(so) or \
                os.path.getmtime(so) < os.path.getmtime(src):
            if not _build(src, so):
                return None
        lib = ctypes.CDLL(so)
        lib.write_png_batch.restype = ctypes.c_int
        lib.write_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        _LIB = lib
        return _LIB


def write_png_batch(images, out_dir: str, start_index: int = 0,
                    threads: int = 0, compress_level: int = 1) -> None:
    """Write a (N,H,W,C) uint8 batch as PNGs, multithreaded in C++;
    falls back to PIL when the native lib is unavailable."""
    import numpy as np
    arr = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w, c = arr.shape
    lib = load_fastpng()
    if lib is None:
        from PIL import Image
        for i in range(n):
            Image.fromarray(arr[i]).save(
                os.path.join(out_dir, f"{start_index + i:05d}.png"))
        return
    failures = lib.write_png_batch(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w, c,
        out_dir.encode(), start_index, threads, compress_level)
    if failures:
        raise IOError(f"fastpng: {failures}/{n} images failed to write")
