"""Procedural image datasets, generated ON DEVICE inside the jitted
training step.

The reference trains from disk datasets (CIFAR-10/CelebA/LSUN lmdb,
ddim/datasets/__init__.py:30-170) through a torch DataLoader; in this
zero-egress environment no image corpus exists, and on TPU the idiomatic
replacement for a host data loader feeding a small model is to fuse the
data generator into the compiled step — infinite unique samples, zero
host<->device traffic, no input pipeline to stall the MXU. The generator
is a pure jittable function of a PRNG key, so the same key always
reproduces the same batch (the JAX answer to the reference's
`seed_everything` determinism).

The distribution itself — soft colored ellipses on a shaded background —
is chosen to have the properties quantization quality metrics care
about: multi-modal structure (count/position/color), smooth gradients
(where banding from over-coarse activation grids shows up first), and
sharp-ish edges (where weight rounding error shows up first).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_BLOBS = 3


def blobs_batch(key: jax.Array, n: int, res: int,
                channels: int = 3) -> jax.Array:
    """(n, res, res, channels) float32 in [-1, 1]: 1..MAX_BLOBS soft
    ellipses with random center/radii/orientation/color over a linear
    background shade. Pure function of ``key`` — jit/vmap/scan-safe."""
    ks = jax.random.split(key, 8)
    yy, xx = jnp.meshgrid(jnp.linspace(-1.0, 1.0, res),
                          jnp.linspace(-1.0, 1.0, res), indexing="ij")

    # background: a random linear shade per image, per channel
    g = jax.random.uniform(ks[0], (n, 1, 1, channels, 2), minval=-0.4,
                           maxval=0.4)
    bg = (g[..., 0] * yy[None, :, :, None] +
          g[..., 1] * xx[None, :, :, None])

    # blobs: center c, inverse radii r, rotation a, color col, count m
    c = jax.random.uniform(ks[1], (n, MAX_BLOBS, 2), minval=-0.6,
                           maxval=0.6)
    r = jax.random.uniform(ks[2], (n, MAX_BLOBS, 2), minval=2.0,
                           maxval=7.0)
    a = jax.random.uniform(ks[3], (n, MAX_BLOBS), minval=0.0,
                           maxval=jnp.pi)
    col = jax.random.uniform(ks[4], (n, MAX_BLOBS, channels),
                             minval=-1.0, maxval=1.0)
    m = jax.random.randint(ks[5], (n,), 1, MAX_BLOBS + 1)

    ca, sa = jnp.cos(a), jnp.sin(a)  # (n, B)
    dy = yy[None, None] - c[:, :, 0, None, None]   # (n, B, res, res)
    dx = xx[None, None] - c[:, :, 1, None, None]
    u = ca[..., None, None] * dx - sa[..., None, None] * dy
    v = sa[..., None, None] * dx + ca[..., None, None] * dy
    d2 = (u * r[:, :, 0, None, None]) ** 2 + \
         (v * r[:, :, 1, None, None]) ** 2
    alive = (jnp.arange(MAX_BLOBS)[None] < m[:, None]).astype(jnp.float32)
    mask = jnp.exp(-d2) * alive[..., None, None]   # (n, B, res, res)
    img = bg + jnp.einsum("nbhw,nbc->nhwc", mask, col) * 1.6
    return jnp.tanh(img).astype(jnp.float32)
