"""Dataset access for evaluation-side needs.

The reference vendors full training datasets (CIFAR-10/CelebA/LSUN-lmdb/
FFHQ, ddim/datasets/ — ~860 LoC) but the PTQ path never reads them:
calibration data is *generated* by the sampler and FID reference
statistics come from precomputed files. We therefore keep only the
pieces evaluation actually uses:

- image-folder / npz readers (to compare generated samples against a
  reference set with external FID tooling);
- the data_transform/inverse_data_transform pair
  (ddim/datasets/__init__.py:175-215) so pixels round-trip identically.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np


def data_transform(x: np.ndarray, rescaled: bool = True,
                   logit_transform: bool = False) -> np.ndarray:
    """[0,1] images -> model space (ddim/datasets/__init__.py:175-192
    subset actually used by the configs: rescaled 2x-1)."""
    if logit_transform:
        x = np.clip(x, 1e-5, 1 - 1e-5)
        return np.log(x) - np.log1p(-x)
    if rescaled:
        return 2.0 * x - 1.0
    return x


def inverse_data_transform(x: np.ndarray, rescaled: bool = True,
                           logit_transform: bool = False) -> np.ndarray:
    if logit_transform:
        return 1.0 / (1.0 + np.exp(-x))
    if rescaled:
        x = (x + 1.0) / 2.0
    return np.clip(x, 0.0, 1.0)


def iter_image_folder(path: str, batch_size: int = 64,
                      size: Optional[int] = None
                      ) -> Iterator[np.ndarray]:
    """Yield float32 [0,1] NHWC batches from a folder of images."""
    from PIL import Image
    files = sorted(f for f in os.listdir(path)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    batch = []
    for f in files:
        im = Image.open(os.path.join(path, f)).convert("RGB")
        if size:
            im = im.resize((size, size), Image.BICUBIC)
        batch.append(np.asarray(im, np.float32) / 255.0)
        if len(batch) == batch_size:
            yield np.stack(batch)
            batch = []
    if batch:
        yield np.stack(batch)


def load_npz_samples(path: str) -> np.ndarray:
    """Read an `arr_0` uint8 sample dump (the FID npz protocol)."""
    return np.load(path)["arr_0"]
