"""AdaRound: learned weight rounding via hard-sigmoid relaxation.

Functional re-implementation of the reference's ``AdaRoundQuantizer``
(/root/reference/quant/adaptive_rounding.py:12-74): a per-element logit
``alpha`` decides whether each weight rounds up or down. During
reconstruction the rounding is a soft value h(alpha) in [0,1] (so gradients
flow); at inference it hardens to (alpha >= 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quantizer import QCfg, broadcast_channel

GAMMA, ZETA = -0.1, 1.1


def init_alpha(w: jax.Array, delta: jax.Array) -> jax.Array:
    """alpha such that h(alpha) equals the fractional part of w/delta
    (adaptive_rounding.py:31-38)."""
    delta = broadcast_channel(delta, w.shape)
    rest = w * (1.0 / delta) - jnp.floor(w * (1.0 / delta))
    rest = jnp.clip(rest, 1e-4, 1.0 - 1e-4)  # guard log of 0/negative
    return -jnp.log((ZETA - GAMMA) / (rest - GAMMA) - 1.0)


def soft_targets(alpha: jax.Array) -> jax.Array:
    """h(alpha) = clamp(sigmoid(alpha)*(zeta-gamma)+gamma, 0, 1)
    (adaptive_rounding.py:40-41)."""
    return jnp.clip(jax.nn.sigmoid(alpha) * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)


def adaround_fq(w: jax.Array, delta: jax.Array, zero_point: jax.Array,
                alpha: jax.Array, cfg: QCfg, soft: bool) -> jax.Array:
    """Quantize-dequantize a weight with AdaRound rounding
    (adaptive_rounding.py:43-71). ``soft`` is a static (trace-time) flag.

    AdaRound's clamp ignores ``always_zero`` (weights never use it):
    NB/PB depend only on ``symmetric`` (adaptive_rounding.py:67).
    """
    delta = broadcast_channel(delta, w.shape)
    zero_point = broadcast_channel(zero_point, w.shape)
    w_floor = jnp.floor(w * (1.0 / delta))
    if soft:
        w_int = w_floor + soft_targets(alpha)
    else:
        w_int = w_floor + (alpha >= 0).astype(w.dtype)
    nb = -cfg.level // 2 if cfg.symmetric else 0
    pb = cfg.level // 2 - 1 if cfg.symmetric else cfg.level - 1
    w_q = jnp.clip(w_int + zero_point, nb, pb)
    return delta * (w_q - zero_point)


def round_regularizer(alpha: jax.Array, b: jax.Array) -> jax.Array:
    """f_reg = sum(1 - |2h-1|^b) — pushes h to {0,1} as temperature b decays
    (reconstruction_util.py:72-73)."""
    h = soft_targets(alpha)
    return jnp.sum(1.0 - jnp.abs(2.0 * h - 1.0) ** b)


def linear_temp_decay(t: jax.Array, t_max: int, rel_start_decay: float,
                      start_b: float = 20.0, end_b: float = 2.0) -> jax.Array:
    """Temperature schedule (reconstruction_util.py:176-198): constant at
    start_b until rel_start_decay*t_max, then linear to end_b."""
    start_decay = rel_start_decay * t_max
    rel_t = (t - start_decay) / jnp.maximum(t_max - start_decay, 1e-9)
    decayed = end_b + (start_b - end_b) * jnp.maximum(0.0, 1.0 - rel_t)
    return jnp.where(t < start_decay, start_b, decayed)
