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
    Registered as a pytree (k/bits/sym static) so it crosses jit
    boundaries. ``sym``: symmetric weight grid — the zero point is
    structurally 0, so the activation-windowed-sum correction term
    vanishes and the deployed ops skip computing it.

    ``w_map``/``v_map``: optional shape-specialized border maps
    (deploy.specialize_maps) — the per-position zero-point correction
    constants that only depend on weights + static conv geometry. When
    present, the deployed conv reads them instead of recomputing a
    ones-kernel conv every step (weights usually cross the jit boundary
    as *arguments*, so XLA cannot constant-fold the maps, and its LICM
    does not reliably hoist convs out of sampler scans)."""

    w_q: jax.Array          # int8, centered (w_int - 2^{b-1}; sym: as-is)
    delta: jax.Array        # (O,) per-channel scale
    zp_c: jax.Array         # (O,) centered zero point, float (zp - 2^{b-1})
    wsum: jax.Array         # (O,) sum of centered int weights, int32
    k: int                  # reduction volume (kh*kw*Cin or Cin)
    bits: int
    sym: bool = False
    w_map: Optional[jax.Array] = None   # (1,Ho,Wo,O) f32
    v_map: Optional[jax.Array] = None   # (1,Ho,Wo,1) f32 (asym only)


jax.tree_util.register_dataclass(
    IntWeight, data_fields=("w_q", "delta", "zp_c", "wsum", "w_map",
                            "v_map"),
    meta_fields=("k", "bits", "sym"))


def fits_int8(cfg: QCfg) -> bool:
    """Whether this grid's centered codes (q - 2^{b-1}) fit int8. The
    integer deployment paths store codes as int8 and center at 2^{b-1};
    wider grids (e.g. --softmax_a_bit 16) would silently wrap, so every
    int8 dispatch gates on this and falls back to fake-quant."""
    return cfg.bits <= 8


@dataclasses.dataclass
class FPWeight:
    """Deployment carrier for >8-bit weight grids: the fake-quantized
    weights are materialized offline (bit-identical to the sim path) and
    the layer executes a plain fp conv/matmul — int8 storage cannot hold
    the centered codes (see fits_int8)."""

    w: jax.Array


jax.tree_util.register_dataclass(FPWeight, data_fields=("w",),
                                 meta_fields=())


def quantize_weight_int(w: jax.Array, delta: jax.Array, zp: jax.Array,
                        cfg: QCfg, alpha: Optional[jax.Array] = None
                        ) -> IntWeight:
    """Offline weight quantization to the centered integer grid. With
    ``alpha``, uses AdaRound hard rounding (floor + (alpha>=0),
    adaptive_rounding.py:58-63) — the deployed weights are exactly the
    calibrated ones. Symmetric grids (qrange already signed, zp = 0)
    are stored as-is with ``sym=True``."""
    sym = cfg.qrange[0] < 0
    off = 0 if sym else 2 ** (cfg.bits - 1)
    d = broadcast_channel(delta, w.shape)
    inv_d = 1.0 / d
    if alpha is not None:
        w_int = jnp.floor(w * inv_d) + (alpha >= 0)
    else:
        w_int = jnp.round(w * inv_d)
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
        bits=cfg.bits, sym=sym)


def quantize_act_int8(x: jax.Array, delta: jax.Array, zp: jax.Array,
                      cfg: QCfg) -> Tuple[jax.Array, jax.Array]:
    """Per-tensor activation quantization to centered int8. Returns
    (x_q' int8, zp_c float scalar). The divide/round runs in f32 even for
    bf16 carriers (fast-deploy mode): the upcast fuses into the sweep, so
    HBM reads stay bf16 while code decisions keep f32 boundaries."""
    off = 2 ** (cfg.bits - 1)
    nb, pb = cfg.qrange
    xf = x.astype(jnp.float32)
    x_q = jnp.clip(jnp.round(xf * (1.0 / delta)) + zp, nb, pb) - off
    return x_q.astype(jnp.int8), (zp - off).astype(jnp.float32)


def int8_conv2d(x_q: jax.Array, zp_xc: jax.Array, dx: jax.Array,
                iw: IntWeight, b: Optional[jax.Array] = None,
                stride: int = 1, pads: Tuple[Tuple[int, int], ...] =
                ((1, 1), (1, 1)), out_dtype=jnp.float32) -> jax.Array:
    """Exact quantized conv: int8 MXU accumulate in int32, then the
    zero-point corrections and the fused dequant epilogue.

    The conv zero-pads x_q' directly (an explicit pre-pad with zp_x'
    would copy the whole int8 tensor each call). Padding with integer 0
    instead of the real-zero code zp_x' makes the border taps contribute
    0 rather than zp_x'·(w' - zp_w'), so the zp_x' cross terms use
    per-position maps that only deviate from the interior constants on
    the border ring:

      out = dx·dw·( conv0(x', w') - zp_w'·S0(x) - zp_x'·W(i,j)
                    + zp_x'·zp_w'·cin·V(i,j) )

    with S0 = windowed sum of zero-padded x', W(i,j,o) = sum of w' over
    the taps valid at (i,j) (interior: wsum), V(i,j) = count of valid
    taps (interior: kh·kw). W and V depend only on weights/shapes — they
    are loop-invariant in a scanned sampler and hoisted by XLA.
    """
    kh, kw, cin, cout = iw.w_q.shape
    dn = ("NHWC", "HWIO", "NHWC")
    strides = (stride, stride)
    pads = list(pads)
    acc = lax.conv_general_dilated(
        x_q, iw.w_q, strides, pads, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    # Border maps depend only on weights + static conv geometry. The
    # deploy-time path (deploy.specialize_maps) precomputes them once
    # per checkpoint and they ride the IntWeight pytree; the fallback
    # recomputes in-graph (trace-time when weights are concrete via
    # ensure_compile_time_eval, else per call — XLA's LICM does not
    # reliably hoist convs out of sampler scans: ~170 us/step in CIFAR
    # traces).
    w_map = iw.w_map
    if w_map is None:
        with jax.ensure_compile_time_eval():
            ones_x = jnp.ones((1,) + x_q.shape[1:3] + (cin,), jnp.int8)
            w_map = lax.conv_general_dilated(
                ones_x, iw.w_q, strides, pads, dimension_numbers=dn,
                preferred_element_type=jnp.int32).astype(jnp.float32)
    corr = acc.astype(jnp.float32) - zp_xc * w_map
    if not iw.sym:
        # windowed sum of x_q': channel-reduce first (VPU), then a
        # single-channel ones conv over the (kh, kw) window
        xsum = jnp.sum(x_q.astype(jnp.int32), axis=-1, keepdims=True)
        ones_k = jnp.ones((kh, kw, 1, 1), jnp.int32)
        s = lax.conv_general_dilated(
            xsum, ones_k, strides, pads, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        v_map = iw.v_map
        if v_map is None:
            with jax.ensure_compile_time_eval():
                v_map = lax.conv_general_dilated(
                    jnp.ones((1,) + x_q.shape[1:3] + (1,), jnp.int32),
                    ones_k, strides, pads, dimension_numbers=dn,
                    preferred_element_type=jnp.int32).astype(jnp.float32)
        corr = (corr
                - iw.zp_c[None, None, None, :] * s.astype(jnp.float32)
                + (cin * zp_xc) * v_map * iw.zp_c[None, None, None, :])
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
    corr = acc - zp_xc * iw.wsum.astype(jnp.float32)
    if not iw.sym:
        xsum = jnp.sum(x_q.astype(jnp.int32), axis=-1,
                       keepdims=True).astype(jnp.float32)
        corr = corr - iw.zp_c * xsum + iw.k * zp_xc * iw.zp_c
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
