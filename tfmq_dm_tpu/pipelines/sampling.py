"""FID sampling loop: batched quantized sampling -> decode -> PNG + npz.

Replaces the reference's per-entry sampling loops (sample_fid,
ddim/runners/diffusion.py:326-364; run(), sample_diffusion_ldm.py:116-189
with its throughput log :148-150; txt2img.py:531-598): jitted sampler
scans, per-batch throughput logging, PNG + npz dumps for the external
FID/IS tooling (README.md:132 protocol).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.tasks import TaskConfig
from ..models import vae as vae_mod

logger = logging.getLogger(__name__)


def inverse_data_transform(x: jax.Array) -> jax.Array:
    """[-1,1] -> [0,1] (ddim/datasets/__init__.py:195-215 'rescaled')."""
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)


def save_images(images: np.ndarray, out_dir: str, start: int,
                watermark: bool = False) -> None:
    from ..native import write_png_batch
    os.makedirs(out_dir, exist_ok=True)
    arr = (np.asarray(images) * 255.0).round().astype(np.uint8)
    if watermark:
        from ..utils import watermark as wm
        arr = np.stack([wm.embed(im) for im in arr])
    write_png_batch(arr, out_dir, start)


def save_grid(images: np.ndarray, path: str,
              n_rows: Optional[int] = None) -> None:
    """Tile [0,1] images into one grid PNG (the reference's txt2img
    grid-xxxx.png output via make_grid, txt2img.py:575-585)."""
    import math

    from PIL import Image
    arr = (np.asarray(images) * 255.0).round().astype(np.uint8)
    n, h, w, c = arr.shape
    rows = n_rows or int(math.floor(math.sqrt(n))) or 1
    cols = -(-n // rows)
    grid = np.zeros((rows * h, cols * w, c), np.uint8)
    for i, im in enumerate(arr):
        r, q = divmod(i, cols)
        grid[r * h:(r + 1) * h, q * w:(q + 1) * w] = im
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)


def slerp(z1: jax.Array, z2: jax.Array, alpha) -> jax.Array:
    """Spherical interpolation between noise latents
    (ddim/runners/diffusion.py sample_interpolation)."""
    theta = jnp.arccos(jnp.sum(z1 * z2)
                       / (jnp.linalg.norm(z1) * jnp.linalg.norm(z2)))
    return (jnp.sin((1 - alpha) * theta) / jnp.sin(theta) * z1
            + jnp.sin(alpha * theta) / jnp.sin(theta) * z2)


def sample_interpolation(task: TaskConfig, sampler_fn: Callable,
                         model_fn: Callable, *, key: jax.Array,
                         n_interp: int = 8,
                         out_dir: Optional[str] = None,
                         vae_params: Optional[dict] = None) -> np.ndarray:
    """Generate a slerp trajectory between two random latents (the
    reference's --interpolation mode, ddim/runners/diffusion.py)."""
    shape = (task.unet.resolution if task.family == "ddim"
             else task.unet.image_size)
    cin = task.unet.in_channels
    k1, k2, k3 = jax.random.split(key, 3)
    z1 = jax.random.normal(k1, (1, shape, shape, cin))
    z2 = jax.random.normal(k2, (1, shape, shape, cin))
    alphas = jnp.linspace(0.0, 1.0, n_interp)
    x0 = jnp.concatenate([slerp(z1, z2, a) for a in alphas])
    out = sampler_fn(model_fn, x0, k3)
    if vae_params is not None:
        out = vae_mod.decode(vae_params, task.vae, out)
    out = np.asarray(inverse_data_transform(out))
    if out_dir:
        save_images(out, out_dir, 0)
    return out


def sample_fid(task: TaskConfig, sampler_fn: Callable, model_fn: Callable,
               *, n_images: int, batch_size: int, key: jax.Array,
               out_dir: Optional[str] = None,
               vae_params: Optional[dict] = None,
               npz_path: Optional[str] = None,
               bundle=None, watermark: bool = False,
               grid_path: Optional[str] = None, mesh=None) -> np.ndarray:
    """Generate ``n_images`` with the given sampler; returns the
    (N,H,W,C) uint8-convertible array in [0,1] and optionally writes
    PNGs + a single npz (the reference's FID evaluation protocol).

    ``bundle``: optional pytree of model state (params/quant state);
    when given, ``model_fn(bundle, x, t, step)`` and the bundle crosses
    the jit boundary as an ARGUMENT — closed-over concrete params get
    embedded as constants in the compiled program, which blows up
    compile payloads for large UNets.

    ``mesh``: optional ``jax.sharding.Mesh`` with a "dp" axis — each
    sampling batch's leading axis is sharded across it, so FID
    generation scales across chips with zero per-step communication
    (samples are independent; the reference's multi-GPU sampling just
    splits -n across ranks, calibration.py:269-282 style). The caller
    owns the bundle's placement: pre-shard params with
    ``parallel.mesh.shard_params_tp`` for tensor parallelism, or leave
    replicated. ``batch_size`` must be divisible by the dp size."""
    shape = (task.unet.resolution if task.family == "ddim"
             else task.unet.image_size)
    cin = task.unet.in_channels
    if mesh is not None:
        assert batch_size % mesh.shape["dp"] == 0, \
            (batch_size, dict(mesh.shape))

    if bundle is not None:
        run_b = jax.jit(lambda b, x, k: sampler_fn(
            lambda xx, tt, ss: model_fn(b, xx, tt, ss), x, k))
        run = lambda x, k: run_b(bundle, x, k)
    else:
        run = jax.jit(lambda x, k: sampler_fn(model_fn, x, k))
    if vae_params is not None:
        decode_v = jax.jit(lambda vp, z: vae_mod.decode(vp, task.vae, z))
    all_imgs = []
    done = 0
    while done < n_images:
        b = min(batch_size, n_images - done)
        key, k1, k2 = jax.random.split(key, 3)
        x0 = jax.random.normal(k1, (batch_size, shape, shape, cin))
        if mesh is not None:
            from ..parallel.mesh import shard_batch
            x0 = shard_batch(mesh, x0)
        t0 = time.perf_counter()
        out = run(x0, k2)
        if vae_params is not None:
            out = decode_v(vae_params, out)
        out = inverse_data_transform(out)
        out = np.asarray(out[:b])
        dt = time.perf_counter() - t0
        logger.info("batch %d: %.2f imgs/s (throughput)", done // batch_size,
                    b / dt)
        if out_dir:
            save_images(out, out_dir, done, watermark=watermark)
        all_imgs.append(out)
        done += b
    imgs = np.concatenate(all_imgs)[:n_images]
    if npz_path:
        np.savez(npz_path, arr_0=(imgs * 255).round().astype(np.uint8))
        logger.info("npz written to %s", npz_path)
    if grid_path:
        save_grid(imgs, grid_path)
        logger.info("grid written to %s", grid_path)
    return imgs
