"""Native fastpng writer: output must decode (via PIL) to the input
pixels exactly, and beat/equal the PIL path functionally."""

import os
import time

import numpy as np
import pytest

from tfmq_dm_tpu import native


def test_fastpng_roundtrip(tmp_path):
    lib = native.load_fastpng()
    if lib is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (6, 24, 16, 3), dtype=np.uint8)
    native.write_png_batch(imgs, str(tmp_path), start_index=3)
    from PIL import Image
    for i in range(6):
        p = tmp_path / f"{3 + i:05d}.png"
        assert p.exists()
        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back, imgs[i])


def test_fastpng_grayscale_and_rgba(tmp_path):
    lib = native.load_fastpng()
    if lib is None:
        pytest.skip("no C++ toolchain")
    from PIL import Image
    rng = np.random.RandomState(1)
    rgba = rng.randint(0, 256, (2, 8, 8, 4), dtype=np.uint8)
    native.write_png_batch(rgba, str(tmp_path), start_index=0)
    np.testing.assert_array_equal(
        np.asarray(Image.open(tmp_path / "00000.png")), rgba[0])


def test_fastpng_throughput(tmp_path):
    """Native writer should be substantially faster than PIL on a
    realistic batch (soft check: at least not slower)."""
    lib = native.load_fastpng()
    if lib is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (64, 256, 256, 3), dtype=np.uint8)
    d1 = tmp_path / "native"
    d2 = tmp_path / "pil"
    d1.mkdir()
    d2.mkdir()
    t0 = time.perf_counter()
    native.write_png_batch(imgs, str(d1))
    t_native = time.perf_counter() - t0
    from PIL import Image
    t0 = time.perf_counter()
    for i, im in enumerate(imgs):
        Image.fromarray(im).save(d2 / f"{i:05d}.png")
    t_pil = time.perf_counter() - t0
    assert len(os.listdir(d1)) == 64
    # soft perf assertion (CI boxes vary); equality would already be odd
    assert t_native < t_pil * 1.5, (t_native, t_pil)
