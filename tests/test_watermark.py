"""Invisible watermark: embed -> decode round trip, invisibility bound,
and grid tiling (the reference's txt2img watermark + grid outputs)."""

import numpy as np

from tfmq_dm_tpu.pipelines.sampling import save_grid
from tfmq_dm_tpu.utils import watermark as wm


def test_embed_decode_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (256, 256, 3), np.uint8)
    marked = wm.embed(img)
    assert wm.decode(marked) == wm.PAYLOAD
    # invisible: perturbs only the blue channel, small on average
    d = marked.astype(int) - img.astype(int)
    assert np.abs(d[..., :2]).max() == 0
    # random-noise images are the worst case for coefficient correction;
    # natural images perturb far less
    assert np.abs(d[..., 2]).mean() < 5.0


def test_decode_survives_noise():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (256, 256, 3), np.uint8)
    marked = wm.embed(img).astype(np.int16)
    noisy = np.clip(marked + rng.randint(-2, 3, marked.shape), 0,
                    255).astype(np.uint8)
    assert wm.decode(noisy) == wm.PAYLOAD


def test_unmarked_image_does_not_decode():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (256, 256, 3), np.uint8)
    assert wm.decode(img) != wm.PAYLOAD


def test_save_grid(tmp_path):
    from PIL import Image
    imgs = np.random.RandomState(3).rand(6, 16, 16, 3)
    p = str(tmp_path / "grid.png")
    save_grid(imgs, p, n_rows=2)
    g = np.asarray(Image.open(p))
    assert g.shape == (2 * 16, 3 * 16, 3)
