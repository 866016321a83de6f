"""Integer deployment ops: exact int8 conv/matmul with zero-point
correction.

The reference only *simulates* quantization (fake-quant in fp32 + full
precision conv, quant_layer.py:306-340) and defers integer speed to
OpenVINO (README.md:132). Here the quantized model EXECUTES in int8 on
the MXU, bit-exactly matching the fake-quant semantics:

    conv(x_dq, w_dq) = dx*dw * conv(x_q - zp_x, w_q - zp_w)

Both operands are stored *centered* (q' = q - 2^{b-1}) so asymmetric
uint grids fit int8, and the cross terms are restored algebraically:

    conv(x_q', w_q') - zp_w'*S(x) - zp_x'*Sw + K*zp_x'*zp_w'

with S(x) = windowed sum of x_q' (one cheap ones-kernel conv, shared by
all output channels), Sw = per-channel weight sums (precomputed), and
K = window volume. Real-zero padding is handled by pre-padding x_q'
with zp_x' (a real 0 quantizes to zp_x, not to integer 0).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..quant.quantizer import QCfg, broadcast_channel


@dataclasses.dataclass
class IntWeight:
    """Deployment-quantized weight: centered int8 values + scales.
    Registered as a pytree (k/bits static) so it crosses jit boundaries."""

    w_q: jax.Array          # int8, centered (w_int - 2^{b-1})
    delta: jax.Array        # (O,) per-channel scale
    zp_c: jax.Array         # (O,) centered zero point, float (zp - 2^{b-1})
    wsum: jax.Array         # (O,) sum of centered int weights, int32
    k: int                  # reduction volume (kh*kw*Cin or Cin)
    bits: int


jax.tree_util.register_dataclass(
    IntWeight, data_fields=("w_q", "delta", "zp_c", "wsum"),
    meta_fields=("k", "bits"))


def quantize_weight_int(w: jax.Array, delta: jax.Array, zp: jax.Array,
                        cfg: QCfg, alpha: Optional[jax.Array] = None
                        ) -> IntWeight:
    """Offline weight quantization to the centered integer grid. With
    ``alpha``, uses AdaRound hard rounding (floor + (alpha>=0),
    adaptive_rounding.py:58-63) — the deployed weights are exactly the
    calibrated ones."""
    off = 2 ** (cfg.bits - 1)
    d = broadcast_channel(delta, w.shape)
    if alpha is not None:
        w_int = jnp.floor(w / d) + (alpha >= 0)
    else:
        w_int = jnp.round(w / d)
    zpb = broadcast_channel(zp, w.shape)
    nb, pb = cfg.qrange
    w_q = jnp.clip(w_int + zpb, nb, pb) - off
    wsum_axes = tuple(range(w.ndim - 1))
    w_q8 = w_q.astype(jnp.int8)
    return IntWeight(
        w_q=w_q8,
        delta=delta.reshape(-1).astype(jnp.float32),
        zp_c=(zp.reshape(-1) - off).astype(jnp.float32),
        wsum=jnp.sum(w_q.astype(jnp.int32), axis=wsum_axes),
        k=int(jnp.prod(jnp.asarray(w.shape[:-1]))),
        bits=cfg.bits)


def quantize_act_int8(x: jax.Array, delta: jax.Array, zp: jax.Array,
                      cfg: QCfg) -> Tuple[jax.Array, jax.Array]:
    """Per-tensor activation quantization to centered int8. Returns
    (x_q' int8, zp_c float scalar)."""
    off = 2 ** (cfg.bits - 1)
    nb, pb = cfg.qrange
    x_q = jnp.clip(jnp.round(x / delta) + zp, nb, pb) - off
    return x_q.astype(jnp.int8), (zp - off).astype(jnp.float32)


def int8_conv2d(x_q: jax.Array, zp_xc: jax.Array, dx: jax.Array,
                iw: IntWeight, b: Optional[jax.Array] = None,
                stride: int = 1, pads: Tuple[Tuple[int, int], ...] =
                ((1, 1), (1, 1)), out_dtype=jnp.float32) -> jax.Array:
    """Exact quantized conv: int8 MXU accumulate in int32, then the
    zero-point corrections and the fused dequant epilogue.

    ``pads``: explicit (H, W) padding of the fp conv being replaced;
    real-zero padding is emulated by pre-padding x_q' with zp_x'.
    """
    kh, kw, cin, cout = iw.w_q.shape
    # pre-pad with the centered act zero-point (= real 0)
    zp_xi = jnp.round(zp_xc).astype(jnp.int8)
    if any(p != (0, 0) for p in pads):
        x_q = jnp.pad(x_q, ((0, 0), pads[0], pads[1], (0, 0)),
                      constant_values=zp_xi)
    acc = lax.conv_general_dilated(
        x_q, iw.w_q, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    # windowed sum of x_q' over (kh, kw, cin): channel-reduce first (VPU),
    # then a single-channel ones conv
    xsum = jnp.sum(x_q.astype(jnp.int32), axis=-1, keepdims=True)
    ones = jnp.ones((kh, kw, 1, 1), jnp.int32)
    s = lax.conv_general_dilated(
        xsum, ones, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    accf = acc.astype(jnp.float32)
    sf = s.astype(jnp.float32)
    corr = (accf
            - iw.zp_c[None, None, None, :] * sf
            - zp_xc * iw.wsum.astype(jnp.float32)[None, None, None, :]
            + iw.k * zp_xc * iw.zp_c[None, None, None, :])
    out = (dx * iw.delta)[None, None, None, :] * corr
    if b is not None:
        out = out + b
    return out.astype(out_dtype)


def int8_linear(x_q: jax.Array, zp_xc: jax.Array, dx: jax.Array,
                iw: IntWeight, b: Optional[jax.Array] = None,
                out_dtype=jnp.float32) -> jax.Array:
    """Exact quantized matmul with zero-point correction (same algebra as
    int8_conv2d with K = Cin)."""
    acc = jax.lax.dot_general(
        x_q, iw.w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    xsum = jnp.sum(x_q.astype(jnp.int32), axis=-1,
                   keepdims=True).astype(jnp.float32)
    corr = (acc - iw.zp_c * xsum - zp_xc * iw.wsum.astype(jnp.float32)
            + iw.k * zp_xc * iw.zp_c)
    out = (dx * iw.delta) * corr
    if b is not None:
        out = out + b
    return out.astype(out_dtype)


def dequant_weight(iw: IntWeight, dtype=jnp.float32) -> jax.Array:
    """w_dq = delta * (w_q' - zp_c) — for weight-only (aq-off) layers."""
    wq = iw.w_q.astype(jnp.float32)
    d = iw.delta.reshape((1,) * (wq.ndim - 1) + (-1,))
    z = iw.zp_c.reshape((1,) * (wq.ndim - 1) + (-1,))
    return (d * (wq - z)).astype(dtype)
