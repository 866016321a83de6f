"""Deployment: convert a calibration artifact into integer weights and an
integer-executing model function.

This is the capability the reference lacks in-repo: it acknowledges that
real speed needs integer kernels and defers to OpenVINO (README.md:132).
Here the calibrated model runs int8 on the MXU, bit-exact with the
fake-quant semantics (see ops/int_ops.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import int_ops
from .adapter import ModelAdapter
from .context import QuantCtx
from .fsc import pack_fsc, slice_fsc, unpack_fsc
from .policy import QuantPolicy

PACK_BLOCK_N = 256


@dataclasses.dataclass
class Int4Weight:
    """Packed 4-bit linear weight for the weight-only deployment path:
    codes stay packed (2 nibbles/byte) in HBM — half the weight
    bandwidth of int8 — and dequant to bf16 per tile in VMEM
    (ops/pallas_kernels.int4_matmul_dequant). N is zero-padded to the
    pack tile; ``n`` is the real output width."""

    w_packed: jax.Array     # (K, Np//2) int8, pack_int4 tile layout
    delta: jax.Array        # (Np,) per-channel scale (pad: 1.0)
    zp_c: jax.Array         # (Np,) centered zero point (zp - 8; pad: 0)
    k: int
    n: int                  # real (unpadded) output channels
    block_n: int


jax.tree_util.register_dataclass(
    Int4Weight, data_fields=("w_packed", "delta", "zp_c"),
    meta_fields=("k", "n", "block_n"))


@dataclasses.dataclass
class Int4ConvWeight:
    """Packed 4-bit conv weight (small-batch serving): per-tap nibble
    packing so the conv reads half the int8 weight bytes; executed by
    ops/pallas_kernels.int4_conv2d_dequant as kh*kw tap GEMMs with
    f32-dequant-to-bf16 in VMEM. Stride-1 SAME convs only — others
    (and CPU) run the XLA fallback on dequantized weights."""

    w_packed: jax.Array     # (kh*kw, cin, Np//2) int8 nibble pairs
    delta: jax.Array        # (Np,) per-channel scale (pad: 1.0)
    zp_c: jax.Array         # (Np,) centered zero point (pad: 0)
    kh: int
    kw: int
    cin: int
    n: int                  # real (unpadded) output channels
    block_n: int


jax.tree_util.register_dataclass(
    Int4ConvWeight, data_fields=("w_packed", "delta", "zp_c"),
    meta_fields=("kh", "kw", "cin", "n", "block_n"))


def _pack_conv_int4(iw: int_ops.IntWeight) -> Int4ConvWeight:
    from ..ops.pallas_kernels import pack_int4
    w_q = np.asarray(iw.w_q)                 # (kh, kw, cin, n) centered
    kh, kw, cin, n = w_q.shape
    npad = -(-n // PACK_BLOCK_N) * PACK_BLOCK_N
    w_q = np.pad(w_q, ((0, 0), (0, 0), (0, 0), (0, npad - n)))
    delta = np.pad(np.asarray(iw.delta), (0, npad - n),
                   constant_values=1.0)
    zp_c = np.pad(np.asarray(iw.zp_c), (0, npad - n))
    packed = jnp.stack([pack_int4(w_q.reshape(kh * kw, cin, npad)[t],
                                  block_n=PACK_BLOCK_N)
                        for t in range(kh * kw)])
    return Int4ConvWeight(w_packed=packed,
                          delta=jnp.asarray(delta, jnp.float32),
                          zp_c=jnp.asarray(zp_c, jnp.float32),
                          kh=kh, kw=kw, cin=cin, n=n,
                          block_n=PACK_BLOCK_N)


def dequant_int4_conv(iw: Int4ConvWeight, dtype=jnp.float32) -> jax.Array:
    """XLA-side unpack + dequant to full HWIO weights (stride!=1 / CPU
    fallback)."""
    from ..ops.pallas_kernels import _unpack_int4
    half = iw.block_n // 2
    npk = iw.w_packed.shape[2] * 2
    taps = []
    for t in range(iw.kh * iw.kw):
        tiles = [_unpack_int4(iw.w_packed[t, :, j * half:(j + 1) * half])
                 for j in range(npk // iw.block_n)]
        taps.append(jnp.concatenate(tiles, axis=1))
    w_q = jnp.stack(taps).astype(jnp.float32)
    w = iw.delta[None, None, :] * (w_q - iw.zp_c[None, None, :])
    w = w.reshape(iw.kh, iw.kw, iw.cin, npk)[:, :, :, :iw.n]
    return w.astype(dtype)


def _pack_linear_int4(iw: int_ops.IntWeight) -> Int4Weight:
    from ..ops.pallas_kernels import pack_int4
    w_q = np.asarray(iw.w_q)           # (K, N) centered codes in [-8, 7]
    k, n = w_q.shape
    npad = -(-n // PACK_BLOCK_N) * PACK_BLOCK_N
    if npad != n:
        w_q = np.pad(w_q, ((0, 0), (0, npad - n)))
    delta = np.pad(np.asarray(iw.delta), (0, npad - n),
                   constant_values=1.0)
    # pad channels: codes 0, zp_c 0 -> w_dq = 0
    zp_c = np.pad(np.asarray(iw.zp_c), (0, npad - n))
    return Int4Weight(
        w_packed=pack_int4(w_q, block_n=PACK_BLOCK_N),
        delta=jnp.asarray(delta, jnp.float32),
        zp_c=jnp.asarray(zp_c, jnp.float32),
        k=k, n=n, block_n=PACK_BLOCK_N)


def dequant_int4(iw: Int4Weight, dtype=jnp.float32) -> jax.Array:
    """XLA-side unpack + dequant (CPU fallback / testing)."""
    from ..ops.pallas_kernels import _unpack_int4
    half = iw.block_n // 2
    k, npk = iw.w_packed.shape
    tiles = []
    for j in range(npk // half):
        tiles.append(_unpack_int4(iw.w_packed[:, j * half:(j + 1) * half]))
    w_q = jnp.concatenate(tiles, axis=1).astype(jnp.float32)
    w = iw.delta[None, :] * (w_q - iw.zp_c[None, :])
    return w[:, :iw.n].astype(dtype)


def cast_fp_params(params, dtype=jnp.bfloat16):
    """Fast-deploy carrier cast: float32 leaves (FP-fallback layers,
    biases, norm params) move to ``dtype``; integer/quantized state is
    untouched. The single definition of the carrier convention — used by
    the CLI --deploy_dtype path and every bench/ablation script."""
    return jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
        params)


def deploy_weights(policy: QuantPolicy, params, wstate: Dict, *,
                   pack_int4_linears: bool = True,
                   int4_serving: bool = False) -> Dict[str, object]:
    """Offline: quantize every wq-enabled layer's weights to centered
    integers using the calibrated (delta, zp[, alpha]). 4-bit LINEAR
    weights are additionally nibble-packed (Int4Weight) so the deployed
    model reads half the weight bytes.

    ``int4_serving``: small-batch latency mode — ALSO pack 4-bit conv
    weights (Int4ConvWeight -> tap-GEMM Pallas kernel) and 4-bit
    act-quantized linears (their acts fake-quant elementwise; the GEMM
    reads packed nibbles). At compute-bound batch sizes the int8 MXU
    path wins instead, hence the flag."""
    deployed = {}
    for name in policy.weight_layers():
        pol = policy.get(name)
        st = wstate.get(name)
        if not pol.wq or st is None:
            continue
        if not int_ops.fits_int8(pol.w_cfg):
            # >8-bit grid: centered codes don't fit int8 storage —
            # materialize the fake-quantized weights offline instead
            # (same hard-rounding semantics as quantize_weight_int)
            from .quantizer import broadcast_channel
            w = params[name]["w"]
            d = broadcast_channel(st["delta"], w.shape)
            zp = broadcast_channel(st["zp"], w.shape)
            if "alpha" in st:
                w_int = jnp.floor(w * (1.0 / d)) + (st["alpha"] >= 0)
            else:
                w_int = jnp.round(w * (1.0 / d))
            nb, pb = pol.w_cfg.qrange
            w_q = jnp.clip(w_int + zp, nb, pb)
            deployed[name] = int_ops.FPWeight(w=d * (w_q - zp))
            continue
        iw = int_ops.quantize_weight_int(
            params[name]["w"], st["delta"], st["zp"], pol.w_cfg,
            alpha=st.get("alpha"))
        # pack only weight-only sites by default: with act quant on, the
        # int8 MXU path (full int8 matmul) beats bf16-dequant at batch
        # sizes where the GEMM is compute-bound; int4_serving flips the
        # trade for bandwidth-bound small-batch serving
        if (pack_int4_linears and pol.w_cfg.bits == 4
                and iw.w_q.ndim == 2 and (int4_serving or not pol.aq)):
            deployed[name] = _pack_linear_int4(iw)
        elif (int4_serving and pol.w_cfg.bits == 4
                and iw.w_q.ndim == 4):
            deployed[name] = _pack_conv_int4(iw)
        else:
            deployed[name] = iw
    return deployed


def specialize_maps(adapter: ModelAdapter, params, deployed: Dict, *,
                    example_args: tuple, use_aq: bool = True) -> Dict:
    """Shape-specialize the deployment: precompute every int8 conv's
    border maps (the per-position zero-point correction constants, see
    ops/int_ops.int8_conv2d) for the conv geometries this model actually
    runs. Geometry is discovered with one ``jax.eval_shape`` forward (no
    FLOPs); the maps are computed once here and ride the IntWeight
    pytree, so the per-step sampler graph contains no ones-kernel convs
    even when the deployment dict crosses the jit boundary as an
    argument (where XLA cannot constant-fold and LICM is unreliable).

    ``example_args``: (x, t[, cond...]) with the deployment's shapes —
    batch size does not matter (maps broadcast over batch), spatial
    resolution does.
    """
    import dataclasses as _dc

    from jax import lax

    ctx = QuantCtx(adapter.policy, wstate={}, astate={}, use_wq=True,
                   use_aq=use_aq, deploy=deployed, flash=True)
    ctx.shape_tape = {}
    jax.eval_shape(lambda a: adapter.forward(params, ctx, *a),
                   example_args)
    dn = ("NHWC", "HWIO", "NHWC")
    out = dict(deployed)
    for name, (hw, stride, pads) in ctx.shape_tape.items():
        iw = deployed.get(name)
        if not isinstance(iw, int_ops.IntWeight) or iw.w_q.ndim != 4:
            continue
        pol = adapter.policy.get(name)
        if not (use_aq and pol is not None and pol.aq):
            continue    # weight-only convs don't use border maps
        kh, kw, cin, _ = iw.w_q.shape
        strides = (stride, stride)
        ones_x = jnp.ones((1,) + tuple(hw) + (cin,), jnp.int8)
        w_map = lax.conv_general_dilated(
            ones_x, iw.w_q, strides, list(pads), dimension_numbers=dn,
            preferred_element_type=jnp.int32).astype(jnp.float32)
        v_map = None
        if not iw.sym:
            ones_k = jnp.ones((kh, kw, 1, 1), jnp.int32)
            v_map = lax.conv_general_dilated(
                jnp.ones((1,) + tuple(hw) + (1,), jnp.int32), ones_k,
                strides, list(pads), dimension_numbers=dn,
                preferred_element_type=jnp.int32).astype(jnp.float32)
        out[name] = _dc.replace(iw, w_map=w_map, v_map=v_map)
    return out


def make_deployed_model_fn(adapter: ModelAdapter, params,
                           deployed: Dict[str, int_ops.IntWeight],
                           astate_batched: Optional[Dict] = None, *,
                           use_aq: bool = False, group_of_step=None,
                           act_dtype=jnp.float32,
                           kv_cache_fn=None) -> Callable:
    """model_fn(x, t, step) that executes int8 convs/matmuls. FSC act
    params are sliced per step like the fake-quant path.

    ``kv_cache_fn``: optional ``(qctx) -> cache`` (see
    quant/inference.make_model_fn) — called once with a group-0 deployed
    ctx so the constant-context cross-attn K/V (int8 GEMM + dequant +
    context act-quant) execute once per prompt, not once per step."""
    if group_of_step is not None:
        group_of_step = jnp.asarray(group_of_step, jnp.int32)

    def make_ctx(astate):
        return QuantCtx(adapter.policy, wstate={}, astate=astate,
                        use_wq=True, use_aq=use_aq, deploy=deployed,
                        act_out_dtype=act_dtype, flash=True)

    kv_cache = None
    if kv_cache_fn is not None:
        astate0 = slice_fsc(astate_batched, 0) \
            if (use_aq and astate_batched) else {}
        kv_cache = kv_cache_fn(make_ctx(astate0))

    # one dynamic row slice per step instead of a gather per site
    # (pack_fsc docstring; bit-exact vs slice_fsc)
    packed = pack_fsc(astate_batched) \
        if (use_aq and astate_batched) else None

    def model_fn(x, t, step, *cond):
        astate = {}
        if packed is not None:
            g = step if group_of_step is None else group_of_step[step]
            flat, spec = packed
            astate = unpack_fsc(flat[g], spec)
        ctx = make_ctx(astate)
        if kv_cache is not None:
            return adapter.forward(params, ctx, x, t, *cond,
                                   kv_cache=kv_cache)
        return adapter.forward(params, ctx, x, t, *cond)

    return model_fn
