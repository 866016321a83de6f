"""Uniform affine quantization primitives (pure JAX, jittable).

Re-implements the math of the reference's ``UniformAffineQuantizer`` and the
four range scalers (minmax / mse / kl / hist) as pure functions
(cf. /root/reference/quant/quant_layer.py:20-253) so they can be vmapped,
scanned, and compiled into calibration programs.

Conventions (TPU-native, differ from the torch reference on purpose):
- activations are NHWC, conv weights are HWIO, linear weights are (in, out).
- "per-channel" weight quantization is over the *output* channel, which in
  our layouts is always the **last** axis of the weight tensor.
- quantizer params are plain arrays: ``delta`` and ``zero_point`` (float),
  scalar for per-tensor, shape ``(..., 1, C_out)``-broadcastable for
  per-channel.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MIN_DELTA = 1e-8


@dataclasses.dataclass(frozen=True)
class QCfg:
    """Static quantizer configuration (hashable; safe to close over in jit).

    Mirrors the constructor flags of the reference quantizer
    (quant_layer.py:165-187): ``bits``, ``symmetric``, ``channel_wise``,
    ``always_zero`` (softmax-output mode where the grid is [0, max] and the
    zero point is pinned to 0).
    """

    bits: int = 8
    symmetric: bool = False
    channel_wise: bool = False
    always_zero: bool = False

    @property
    def level(self) -> int:
        return 2 ** self.bits

    @property
    def qrange(self) -> Tuple[int, int]:
        """(NB, PB) clamp bounds, cf. quant_layer.py:223-224."""
        if self.symmetric and not self.always_zero:
            return -self.level // 2, self.level // 2 - 1
        return 0, self.level - 1


def ste_round(x: jax.Array) -> jax.Array:
    """round() with a straight-through gradient (quant_layer.py:159-160)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def fake_quant(x: jax.Array, delta: jax.Array, zero_point: jax.Array,
               cfg: QCfg) -> jax.Array:
    """Quantize-dequantize with STE gradients (quant_layer.py:223-227).
    Preserves x's dtype: fp32 quantizer params would otherwise promote
    a bf16 inference path to fp32 wholesale (2x HBM, off the fast VPU
    path). The q/dq arithmetic itself runs in the promoted precision."""
    nb, pb = cfg.qrange
    # reciprocal-multiply instead of a full-width divide (a fraction of
    # VPU mul throughput); EVERY quantize path uses the same form so
    # sim and deployed integer codes stay bit-identical to each other
    x_q = jnp.clip(ste_round(x * (1.0 / delta)) + zero_point, nb, pb)
    return (delta * (x_q - zero_point)).astype(x.dtype)


def quant_int(x: jax.Array, delta: jax.Array, zero_point: jax.Array,
              cfg: QCfg, dtype=jnp.int8) -> jax.Array:
    """Real integer quantization (no dequant) for the deployment kernels."""
    nb, pb = cfg.qrange
    x_q = jnp.clip(jnp.round(x * (1.0 / delta)) + zero_point, nb, pb)
    return x_q.astype(dtype)


def _delta_zp_from_range(x_min, x_max, cfg: QCfg):
    """(delta, zero_point) from a closed range, matching ``minmax``
    (quant_layer.py:20-35) given that range as the data min/max."""
    if cfg.symmetric:
        m = jnp.maximum(jnp.abs(x_min), x_max)
        delta = (2.0 * m) / (cfg.level - 2)
    else:
        delta = (x_max - x_min) / (cfg.level - 1)
    if cfg.always_zero:
        delta = x_max / (cfg.level - 1)
    delta = jnp.maximum(delta, MIN_DELTA)
    if cfg.symmetric or cfg.always_zero:
        zp = jnp.zeros_like(delta)
    else:
        zp = jnp.round(-x_min / delta)
    return delta, zp


# --------------------------------------------------------------------------
# Range scalers. Each takes a 1-D (flattened) tensor view and returns scalar
# (delta, zero_point). Per-channel variants vmap over a leading channel axis.
# --------------------------------------------------------------------------

def scaler_minmax(x: jax.Array, cfg: QCfg):
    """quant_layer.py:20-35 — note min is clamped to <=0 and max to >=0."""
    x_min = jnp.minimum(jnp.min(x), 0.0)
    x_max = jnp.maximum(jnp.max(x), 0.0)
    return _delta_zp_from_range(x_min, x_max, cfg)


def scaler_mse(x: jax.Array, cfg: QCfg, num_steps: int = 80, p: float = 2.4):
    """80-step range-shrink search minimizing the L_p quantization error
    (quant_layer.py:38-64). Runs as a fori_loop so big weight tensors are
    not materialized x80.
    """
    x_min = jnp.min(x)
    x_max = jnp.max(x)
    nb, pb = cfg.qrange

    def candidate(i):
        shrink = 1.0 - i * 0.01
        new_min = x_min * shrink
        new_max = x_max * shrink
        delta, zp = _delta_zp_from_range(new_min, new_max, cfg)
        x_q = jnp.clip(jnp.round(x * (1.0 / delta)) + zp, nb, pb)
        x_dq = delta * (x_q - zp)
        score = jnp.mean(jnp.abs(x_dq - x) ** p)
        return score, delta, zp

    def body(i, carry):
        best_s, best_d, best_z = carry
        s, d, z = candidate(i.astype(jnp.float32))
        better = s < best_s
        return (jnp.where(better, s, best_s),
                jnp.where(better, d, best_d),
                jnp.where(better, z, best_z))

    s0, d0, z0 = candidate(jnp.float32(0.0))
    _, delta, zp = jax.lax.fori_loop(1, num_steps, body, (s0, d0, z0))
    return delta, zp


def scaler_kl(x: np.ndarray, cfg: QCfg, bins: int | None = None):
    """Histogram-KL clip search (quant_layer.py:67-110). Host-side numpy —
    only used at calibration time, deterministic."""
    np_x = np.asarray(x, dtype=np.float64).reshape(-1)
    level = bins or cfg.level
    ref_hist, ref_bins = np.histogram(np_x, bins=level, density=True)
    sumd = np.sum(np.diff(ref_bins))
    smooth_ref = (ref_hist + 1e-5) / (1.0 + sumd * 1e-5)

    def resample(targ_hist, targ_bins, orig_bins):
        targ_v, targ_i = 0.0, 0
        targ_bin = targ_bins[0]
        out = np.zeros(len(orig_bins) - 1)
        for i, orig_bin in enumerate(orig_bins[:-1]):
            if targ_bin <= orig_bin:
                if targ_i < len(targ_bins) - 1:
                    targ_v = targ_hist[targ_i]
                    targ_i += 1
                    targ_bin = targ_bins[targ_i]
                else:
                    targ_v = 0.0
                    targ_bin = orig_bin.max() + 1.0
            out[i] = targ_v
        return out

    min_kl, best_ratio = 1e5, 1.0
    for clip_ratio in np.linspace(0.5, 1.0, 50):
        lo, hi = np_x.min() * clip_ratio, np_x.max() * clip_ratio
        q_hist, q_bins = np.histogram(np.clip(np_x, lo, hi), bins=level,
                                      density=True)
        c_q = resample(q_hist, q_bins, ref_bins)
        c_q = (c_q + 1e-5) / (1.0 + sumd * 1e-5)
        kl_val = float(np.sum(smooth_ref * np.log(smooth_ref / c_q)))
        if kl_val < min_kl:
            min_kl, best_ratio = kl_val, clip_ratio
    lo, hi = np_x.min() * best_ratio, np_x.max() * best_ratio
    clipped = np.clip(np_x, lo, hi)
    return scaler_minmax(jnp.asarray(clipped, dtype=jnp.float32), cfg)


def scaler_hist(x: np.ndarray, cfg: QCfg, threshold: float = 0.9996):
    """Percentile-mass clip (quant_layer.py:113-133). Host-side numpy."""
    np_x = np.asarray(x, dtype=np.float64).reshape(-1)
    level = cfg.level
    data_max = max(-np_x.min(), np_x.max())
    h, _ = np.histogram(np_x, bins=level, range=(0, data_max), density=True)
    h = h.astype(np.float64) / h.sum()
    accum = 0.0
    x_min, x_max = np_x.min(), np_x.max()
    for i in range(len(h)):
        accum += h[i]
        if accum >= threshold:
            clip_value = (i + 0.5) * (data_max / level)
            x_min = max(-clip_value, np_x.min())
            x_max = min(clip_value, np_x.max())
            break
    clipped = np.clip(np_x, x_min, x_max)
    return scaler_minmax(jnp.asarray(clipped, dtype=jnp.float32), cfg)


SCALERS = {
    "minmax": scaler_minmax,
    "mse": scaler_mse,
    "kl": scaler_kl,
    "hist": scaler_hist,
}


def init_qparams(x: jax.Array, cfg: QCfg, scaler: str = "mse"):
    """Initialize (delta, zero_point) for a tensor.

    Per-tensor: scalars. Per-channel (``cfg.channel_wise``): the channel is
    the **last** axis of ``x`` (our weight layouts put C_out last); returns
    arrays of shape ``(C,)``. Equivalent to the reference's recursive
    per-channel init (quant_layer.py:189-209) but vectorized with vmap.
    """
    fn = SCALERS[scaler]
    if scaler in ("kl", "hist"):
        # host-side; fine for calibration-time use
        if cfg.channel_wise:
            xs = np.asarray(x).reshape(-1, x.shape[-1]).T
            outs = [fn(c, cfg) for c in xs]
            delta = jnp.stack([o[0] for o in outs])
            zp = jnp.stack([o[1] for o in outs])
            return delta, zp
        return fn(np.asarray(x), cfg)
    if cfg.channel_wise:
        xc = x.reshape(-1, x.shape[-1]).T  # (C, K)
        return jax.vmap(lambda v: fn(v, cfg))(xc)
    return fn(x.reshape(-1), cfg)


def broadcast_channel(p: jax.Array, wshape: Tuple[int, ...]) -> jax.Array:
    """Reshape per-channel params (C,) to broadcast against a weight of
    shape (..., C)."""
    if p.ndim == 0:
        return p
    return p.reshape((1,) * (len(wshape) - 1) + (p.shape[0],))


# --------------------------------------------------------------------------
# Running-stat EMA update (FSC activation calibration),
# cf. quant_layer.py:229-244. Functional: takes and returns the EMA range.
# --------------------------------------------------------------------------

def ema_range_update(x: jax.Array, x_min: jax.Array, x_max: jax.Array,
                     momentum: float = 0.95):
    new_min = x_min * momentum + jnp.min(x) * (1.0 - momentum)
    new_max = x_max * momentum + jnp.max(x) * (1.0 - momentum)
    return new_min, new_max


def qparams_from_range(x_min: jax.Array, x_max: jax.Array, cfg: QCfg):
    """delta/zp from an explicit [x_min, x_max] range via the minmax rule
    (the reference achieves this by clipping a sample tensor and writing the
    range into two elements — quant_layer.py:239-243; we compute directly).

    Follows minmax's clamping of the range to include 0.
    """
    return _delta_zp_from_range(jnp.minimum(x_min, 0.0),
                                jnp.maximum(x_max, 0.0), cfg)


# --------------------------------------------------------------------------
# Losses (quant_layer.py:146-156)
# --------------------------------------------------------------------------

def lp_loss(pred: jax.Array, tgt: jax.Array, p: float = 2.0,
            channel_axis: int = -1) -> jax.Array:
    """|pred-tgt|^p summed over the channel axis, averaged over the rest.

    The reference sums over dim 1 of NCHW (quant_layer.py:151-152); our
    tensors are channel-last, so the channel axis defaults to -1.
    """
    return jnp.mean(jnp.sum(jnp.abs(pred - tgt) ** p, axis=channel_axis))


def lp_loss_all(pred: jax.Array, tgt: jax.Array, p: float = 2.0) -> jax.Array:
    return jnp.mean(jnp.abs(pred - tgt) ** p)
