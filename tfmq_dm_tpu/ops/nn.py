"""Functional NN primitives, NHWC/HWIO layouts (TPU-native).

These are the XLA-compiled equivalents of what the torch reference gets
from cuDNN/cuBLAS via ``torch.nn.functional``. Convolutions use
``lax.conv_general_dilated`` with NHWC/HWIO dimension numbers so XLA tiles
them straight onto the MXU.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

Padding = Union[str, Sequence[Tuple[int, int]]]


def conv2d(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
           stride: int = 1, padding: Padding = "SAME") -> jax.Array:
    """x: (B,H,W,Cin), w: (kh,kw,Cin,Cout). x follows w's dtype (so a
    bf16-cast param tree runs fully in bf16 on the MXU)."""
    x = x.astype(w.dtype)
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b
    return out


def linear(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """x: (..., Cin), w: (Cin, Cout). x follows w's dtype."""
    x = x.astype(w.dtype)
    out = jnp.dot(x, w, preferred_element_type=x.dtype)
    if b is not None:
        out = out + b
    return out


def group_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               groups: int = 32, eps: float = 1e-6) -> jax.Array:
    """GroupNorm over channel-last tensors; normalizes (H,W,C/g) per group,
    matching torch.nn.GroupNorm semantics."""
    c = x.shape[-1]
    g = groups
    dt = x.dtype
    # (B, H*W, g, c/g) — reduce over (H*W, c/g) per group; stats in f32.
    # E[x] and E[x^2] in a single fused pass (jnp.var would re-reduce).
    xg = x.astype(jnp.float32).reshape(x.shape[0], -1, g, c // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    m2 = jnp.mean(xg * xg, axis=(1, 3), keepdims=True)
    var = jnp.maximum(m2 - mean * mean, 0.0)
    xn = (xg - mean) * lax.rsqrt(var + eps)
    xn = xn.reshape(x.shape).astype(dt)
    return xn * gamma + beta


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample, NHWC (torch interpolate mode='nearest')."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def avg_pool_2x(x: jax.Array) -> jax.Array:
    return lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                             "VALID") / 4.0


def timestep_embedding(t: jax.Array, dim: int,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding matching the DDIM reference
    (ddim/models/diffusion.py:6-24): freq = exp(-log(1e4)*i/(half-1)),
    output = concat[sin, cos]."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * -(math.log(max_period) / (half - 1)))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def timestep_embedding_ldm(t: jax.Array, dim: int,
                           max_period: float = 10000.0) -> jax.Array:
    """OpenAI/LDM variant (diffusionmodules/util.py:151-171):
    freq = exp(-log(1e4)*i/half), output = concat[cos, sin]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
