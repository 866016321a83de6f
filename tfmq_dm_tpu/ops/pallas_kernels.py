"""Pallas (Mosaic) TPU kernels for the quantized hot ops.

The reference has zero native code — its "int kernels" are deferred to
OpenVINO (README.md:132). Here the deployment path gets real fused
kernels:

- :func:`int8_matmul_fused` — quantize(x) -> int8 MXU dot -> zero-point
  corrections -> dequant epilogue, one VMEM round-trip (the XLA int path
  in ops/int_ops.py materializes the int8 activation tensor in HBM);
- :func:`int4_matmul_dequant` — weight-only int4: weights live PACKED
  (2 nibbles/byte) in HBM, halving weight bandwidth vs int8; unpack +
  dequant to bf16 in VMEM, then MXU dot. For bandwidth-bound layers
  (big linears at small batch) this is the speed-of-light path.
- :func:`pack_int4` / companion quantizers for offline weight prep.

All kernels are exact vs the fake-quant semantics (tests compare against
ops/int_ops.py which is itself bit-checked against fake-quant).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# fused int8 matmul: quantize + dot + zp-correct + dequant
# ---------------------------------------------------------------------------

def _int8_mm_kernel(sc_ref, x_ref, wq_ref, dly_ref, zpc_ref, wsum_ref,
                    b_ref, o_ref, acc_ref, xsum_ref):
    """K-blocked (bm, bn) output tile with int32 MXU accumulation in
    VMEM scratch; corrections + dequant epilogue at the last k step.

    sc_ref (SMEM): [dx, zp_xc, k_red] scalars.
    """
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xsum_ref[:] = jnp.zeros_like(xsum_ref)

    dx = sc_ref[0]
    zp_xc = sc_ref[1]
    x = x_ref[:].astype(jnp.float32)               # (bm, bk); bf16 DMA
    # per-tensor act quantization to centered int8
    x_q = jnp.clip(jnp.round(x * (1.0 / dx)) + (zp_xc + 128.0), 0.0, 255.0) - 128.0
    x_q8 = x_q.astype(jnp.int8)
    acc_ref[:] += jax.lax.dot_general(
        x_q8, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    xsum_ref[:] += jnp.sum(x_q, axis=1, keepdims=True)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        k_red = sc_ref[2]
        zpc = zpc_ref[:]                           # (1, bn)
        wsum = wsum_ref[:]                         # (1, bn)
        corr = (acc_ref[:] - zpc * xsum_ref[:] - zp_xc * wsum
                + k_red * zp_xc * zpc)
        o_ref[:] = ((dx * dly_ref[:]) * corr
                    + b_ref[:]).astype(o_ref.dtype)


def int8_matmul_fused(x: jax.Array, w_q: jax.Array, delta_w: jax.Array,
                      zp_wc: jax.Array, wsum: jax.Array, dx, zp_xc,
                      bias: Optional[jax.Array] = None,
                      block_m: int = 256, block_n: int = 256,
                      block_k: int = 512,
                      out_dtype=jnp.float32) -> jax.Array:
    """x: (M, K) float; w_q: (K, N) centered int8; per-channel
    delta_w/zp_wc/wsum: (N,); scalar act (dx, zp_xc). Exact int8 GEMM with
    asymmetric zero-point corrections (same algebra as
    int_ops.int8_linear)."""
    m, k = x.shape
    n = w_q.shape[1]
    bm = min(block_m, m)
    bn = min(block_n, n)
    bk = min(block_k, k)
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    scalars = jnp.stack([jnp.asarray(dx, jnp.float32),
                         jnp.asarray(zp_xc, jnp.float32),
                         jnp.float32(k)])
    grid = (_cdiv(m, bm), _cdiv(n, bn), _cdiv(k, bk))
    out = pl.pallas_call(
        _int8_mm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32),
                        pltpu.VMEM((bm, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k * n + m * n * 2,
            transcendentals=0),
    )(scalars, x, w_q,
      delta_w.reshape(1, n).astype(jnp.float32),
      zp_wc.reshape(1, n).astype(jnp.float32),
      wsum.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32))
    return out


# ---------------------------------------------------------------------------
# int4 weight-only matmul: packed weights, dequant-to-bf16 in VMEM
# ---------------------------------------------------------------------------

def _int8_mm_pre_kernel(sc_ref, xq_ref, xs_ref, wq_ref, dly_ref, zpc_ref,
                        wsum_ref, b_ref, o_ref, acc_ref):
    """Like _int8_mm_kernel but over PRE-quantized int8 activations
    (xq) with a precomputed row-sum (xs): the kernel is pure int8 MXU
    accumulation + a fused corrections/dequant/bias epilogue, so the
    int32 accumulator never round-trips HBM (XLA's int8 dot emits a
    separate convert/multiply epilogue pass per GEMM)."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        xq_ref[:], wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        dx = sc_ref[0]
        zp_xc = sc_ref[1]
        k_red = sc_ref[2]
        zpc = zpc_ref[:]                           # (1, bn)
        wsum = wsum_ref[:]                         # (1, bn)
        corr = (acc_ref[:].astype(jnp.float32) - zpc * xs_ref[:]
                - zp_xc * wsum + k_red * zp_xc * zpc)
        o_ref[:] = ((dx * dly_ref[:]) * corr
                    + b_ref[:]).astype(o_ref.dtype)


def int8_matmul_pre(x_q: jax.Array, xsum: jax.Array, w_q: jax.Array,
                    delta_w: jax.Array, zp_wc: jax.Array,
                    wsum: jax.Array, dx, zp_xc,
                    bias: Optional[jax.Array] = None,
                    block_m: int = 512, block_n: int = 512,
                    block_k: int = 512,
                    out_dtype=jnp.float32) -> jax.Array:
    """x_q: (M, K) centered int8 codes; xsum: (M, 1) fp32 row sums of
    x_q; w_q: (K, N) centered int8; per-channel delta_w/zp_wc/wsum:
    (N,); scalar act (dx, zp_xc). Exact zero-point-corrected GEMM with
    the dequant epilogue fused into the MXU accumulation."""
    m, k = x_q.shape
    n = w_q.shape[1]
    bm = min(block_m, m)
    bn = min(block_n, n)
    bk = min(block_k, k)
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    scalars = jnp.stack([jnp.asarray(dx, jnp.float32),
                         jnp.asarray(zp_xc, jnp.float32),
                         jnp.float32(k)])
    grid = (_cdiv(m, bm), _cdiv(n, bn), _cdiv(k, bk))
    return pl.pallas_call(
        _int8_mm_pre_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + k * n + m * n * 2,
            transcendentals=0),
    )(scalars, x_q, xsum, w_q,
      delta_w.reshape(1, n).astype(jnp.float32),
      zp_wc.reshape(1, n).astype(jnp.float32),
      wsum.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32))


def pack_int4(w_q: np.ndarray, block_n: int = 256) -> jax.Array:
    """Pack centered int4 values in [-8, 7], shape (K, N), into int8
    bytes (K, N//2), tile-blocked so the in-kernel unpack is a
    lane-contiguous CONCAT (Mosaic rejects interleaving reshapes):
    within each ``block_n``-column tile, byte column c holds tile column
    c (low nibble) and tile column c + block_n/2 (high nibble)."""
    w = np.asarray(w_q, np.int8)
    k, n = w.shape
    bn = min(block_n, n)
    assert n % bn == 0 and bn % 2 == 0
    out = np.empty((k, n // 2), np.uint8)
    half = bn // 2
    for j in range(n // bn):
        tile = w[:, j * bn:(j + 1) * bn]
        lo = (tile[:, :half] & 0xF).astype(np.uint8)
        hi = (tile[:, half:] & 0xF).astype(np.uint8)
        out[:, j * half:(j + 1) * half] = lo | (hi << 4)
    return jnp.asarray(out.astype(np.int8))


def _unpack_int4(packed):
    """(K, bn//2) int8 tile -> (K, bn) int32: [low-nibble cols,
    high-nibble cols] concatenated (matches pack_int4's tile layout).
    Mosaic has no int8 vector shifts — decode in int32: the byte is
    lo_bits + 16*hi_signed, so hi = byte >> 4 (arithmetic) and
    lo = sign_extend_4(byte & 15) via the xor-8-minus-8 trick."""
    p32 = packed.astype(jnp.int32)
    lo = ((p32 & 15) ^ 8) - 8
    hi = jax.lax.shift_right_arithmetic(p32, 4)
    return jnp.concatenate([lo, hi], axis=1)


def _int4_mm_kernel(x_ref, wp_ref, dly_ref, zpc_ref, b_ref, o_ref,
                    acc_ref):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wq = _unpack_int4(wp_ref[:]).astype(jnp.bfloat16)
    w = (wq - zpc_ref[:].astype(jnp.bfloat16)) \
        * dly_ref[:].astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:] + b_ref[:]


def int4_matmul_dequant(x: jax.Array, w_packed: jax.Array,
                        delta_w: jax.Array, zp_wc: jax.Array,
                        bias: Optional[jax.Array] = None,
                        block_m: int = 256, block_n: int = 256,
                        block_k: int = 512,
                        out_dtype=jnp.float32) -> jax.Array:
    """Weight-only int4 GEMM: x (M, K) x packed w (K, N//2) -> (M, N).
    Weights stay packed in HBM; dequant to bf16 happens in VMEM per tile
    (w_dq = delta * (w_q4 - zp_wc), zp_wc = zp - 8 centered).
    ``w_packed`` must come from pack_int4(..., block_n=<same block_n>).
    """
    m, k = x.shape
    n = w_packed.shape[1] * 2
    bm = min(block_m, m)
    bn = min(block_n, n)
    bk = min(block_k, k)
    assert bn % 2 == 0
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    grid = (_cdiv(m, bm), _cdiv(n, bn), _cdiv(k, bk))
    out = pl.pallas_call(
        _int4_mm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn // 2), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 4 + k * n // 2 + m * n * 4,
            transcendentals=0),
    )(x.astype(jnp.float32), w_packed,
      delta_w.reshape(1, n).astype(jnp.float32),
      zp_wc.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32))
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# fused GroupNorm (+scale-shift) + SiLU + int8 activation quantize
# ---------------------------------------------------------------------------

def _gn_sq_kernel(sc_ref, x_ref, g_ref, b_ref, ss_ref, o_ref, *,
                  groups, eps, nb, pb, off, do_swish, has_ss):
    """One batch row per grid cell: the row lives in VMEM across both
    the stats pass and the apply pass, so x is read from HBM once
    (the XLA chain reads it twice — reduce, then normalize) and the
    swish + quantize sweeps fuse into the normalize write.

    Group stats with C as the lane dim: per-column sums (sublane
    reduction), then fold columns into groups with a tiny (C, g) 0/1
    selection matmul — reshaping lanes to (g, C/g) would put C/g (e.g.
    10 for SD's 320ch/32g) on the lane axis, off the tiled layout."""
    hw, c = x_ref.shape[1:]
    cg = c // groups
    delta = sc_ref[0]
    zp = sc_ref[1]
    # row chunks bound the f32 temporaries (a whole 4096x320 row's
    # worth of f32 intermediates overflowed the 16 MB scoped VMEM)
    ch = min(hw, 512)
    assert hw % ch == 0, (hw, ch)
    nch = hw // ch

    col = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    msel = (col == grp).astype(jnp.float32)             # (C, g)

    def stats(i, carry):
        s1, s2 = carry
        xc = x_ref[0, pl.ds(i * ch, ch), :].astype(jnp.float32)
        s1 = s1 + jnp.sum(xc, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(xc * xc, axis=0, keepdims=True)
        return s1, s2

    z = jnp.zeros((1, c), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, nch, stats, (z, z))
    gs1 = jnp.dot(s1, msel, preferred_element_type=jnp.float32)
    gs2 = jnp.dot(s2, msel, preferred_element_type=jnp.float32)
    n = float(hw * cg)
    mean_g = gs1 * (1.0 / n)
    var_g = jnp.maximum(gs2 * (1.0 / n) - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, msel.T,
                     preferred_element_type=jnp.float32)  # (1, C)
    inv_c = jnp.dot(inv_g, msel.T,
                    preferred_element_type=jnp.float32)

    gamma = g_ref[0].astype(jnp.float32)
    beta = b_ref[0].astype(jnp.float32)
    # fold gamma/inv into one per-channel scale, beta/mean into one bias
    a = inv_c * gamma
    bb = beta - mean_c * a
    if has_ss:
        scale = ss_ref[0, 0:1].astype(jnp.float32)      # (1, C)
        shift = ss_ref[0, 1:2].astype(jnp.float32)
        # y*(1+scale)+shift folds into the same affine form
        a = a * (1.0 + scale)
        bb = bb * (1.0 + scale) + shift

    def apply(i, _):
        xc = x_ref[0, pl.ds(i * ch, ch), :].astype(jnp.float32)
        y = xc * a + bb
        if do_swish:
            y = y * jax.nn.sigmoid(y)
        q = jnp.clip(jnp.round(y * (1.0 / delta)) + zp, nb, pb) - off
        o_ref[0, pl.ds(i * ch, ch), :] = q.astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, nch, apply, 0)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "qrange",
                                             "off", "do_swish",
                                             "interpret"))
def _gn_sq_call(x, gamma, beta, dz, ss, *, groups, eps, qrange, off,
                do_swish, interpret):
    b, hw, c = x.shape
    nb, pb = qrange
    has_ss = ss is not None
    if ss is None:
        ss = jnp.zeros((b, 2, c), x.dtype)
    kern = functools.partial(
        _gn_sq_kernel, groups=groups, eps=float(eps), nb=float(nb),
        pb=float(pb), off=float(off), do_swish=do_swish, has_ss=has_ss)
    return pl.pallas_call(
        kern, grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), jnp.int8),
        interpret=interpret,
    )(dz, x, gamma.reshape(1, c), beta.reshape(1, c), ss)


def gn_swish_quant_int8(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                        delta, zp, cfg, *, groups: int = 32,
                        eps: float = 1e-5, do_swish: bool = True,
                        ss: Optional[Tuple[jax.Array, jax.Array]] = None,
                        interpret: bool = False):
    """GroupNorm -> [scale-shift] -> [SiLU] -> per-tensor int8 act
    quantize, fused in one VMEM-resident pass per batch row. NHWC in,
    centered int8 codes out (the int8_conv2d input contract,
    ops/int_ops.py quantize_act_int8). ``ss``: the LDM scale-shift-norm
    conditioning pair, each (B, C) (openaimodel.py:268-272).

    Fast-deploy only: summation order inside the stats differs from the
    XLA group_norm by reduction tree, so exact f32 deployments (bit
    equality vs the fake-quant sim) keep the unfused ops."""
    bsz, h, w, c = x.shape
    off = 2 ** (cfg.bits - 1)
    dz = jnp.stack([jnp.asarray(delta, jnp.float32).reshape(()),
                    jnp.asarray(zp, jnp.float32).reshape(())])
    ss3 = None
    if ss is not None:
        ss3 = jnp.stack([ss[0], ss[1]], axis=1).astype(x.dtype)  # (B,2,C)
    out = _gn_sq_call(x.reshape(bsz, h * w, c), gamma, beta, dz, ss3,
                      groups=groups, eps=eps, qrange=cfg.qrange, off=off,
                      do_swish=do_swish, interpret=interpret)
    return out.reshape(bsz, h, w, c), \
        (jnp.asarray(zp, jnp.float32) - off).astype(jnp.float32)


# ---------------------------------------------------------------------------
# packed-int4 conv: weights stay packed in HBM, tap-wise GEMM accumulate
# ---------------------------------------------------------------------------

def _int4_conv_kernel(x_ref, wp_ref, dly_ref, zpc_ref, b_ref, o_ref, *,
                      kh, kw, bh, w, out_dtype):
    """One (batch row, output-row block, cout tile) per grid cell.
    x_ref is the PRE-padded image (1, H+kh-1, w+kw-1, cin) — resident
    across the row-block axis (its index map ignores it), so only the
    f32 accumulator and output tile pay per-block VMEM; the conv is
    Σ_taps shift(x) @ W_tap — kh*kw GEMMs over the cin contraction,
    each tap's weights unpacked from nibbles and dequantized to bf16 in
    VMEM (packed bytes are all that crosses HBM: half the int8 weight
    bandwidth). Row blocking keeps the scoped VMEM under the 16M limit
    at SD-scale shapes (64x64x960 inputs OOM'd a full-height acc)."""
    nb_, cout_t = dly_ref.shape
    hb = pl.program_id(1)
    acc = jnp.zeros((bh, w, cout_t), jnp.float32)
    dly = dly_ref[0]
    zpc = zpc_ref[0]
    for t in range(kh * kw):
        i, j = divmod(t, kw)
        wq = _unpack_int4(wp_ref[t]).astype(jnp.float32)
        # dequant in f32, ONE rounding to the bf16 operand (a bf16
        # dequant chain double-rounds through the pre-rounded delta)
        wd = ((wq - zpc) * dly).astype(jnp.bfloat16)  # (cin, cout_t)
        xw = x_ref[0, pl.dslice(hb * bh + i, bh), pl.dslice(j, w), :]
        acc = acc + jax.lax.dot_general(
            xw.astype(jnp.bfloat16), wd, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0] = (acc + b_ref[0]).astype(out_dtype)


# scoped-VMEM budget for the tap-GEMM kernel plan: the hardware limit is
# 16 MB; 14 MB leaves slack for Mosaic temporaries the estimate can't see
_INT4_CONV_VMEM_BUDGET = 14 * 2 ** 20


def _int4_conv_plan(ho: int, wo: int, cin: int, npk: int, kh: int,
                    kw: int, bn: int, in_bytes: int,
                    block_h: int = 32) -> Optional[int]:
    """Pick the largest feasible output-row block (bh) for the tap-GEMM
    kernel, or None when even bh=1 blows the scoped-VMEM limit — the
    dominant, bh-independent term is the per-batch-row resident padded
    image (double-buffered by the pipeline), which at SD's 64x64
    640-channel convs alone exceeds the 16 MB limit. Those big-spatial
    shapes are activation-dominated (image bytes >> packed weight bytes),
    so the caller loses nothing falling back to an XLA conv on
    dequantized weights; the weight-bandwidth-bound low-resolution
    1280-channel convs all fit."""
    def ru(a, m):
        return -(-a // m) * m

    hp, wp = ho + kh - 1, wo + kw - 1
    x_b = 2 * hp * ru(wp, 16) * ru(cin, 128) * in_bytes
    w_b = 2 * kh * kw * ru(cin, 32) * ru(bn // 2, 128)
    bh = min(block_h, ho)
    while bh >= 1:
        while ho % bh:
            bh -= 1
        o_b = 2 * bh * ru(wo, 16) * ru(bn, 128) * in_bytes
        acc = bh * ru(wo, 8) * ru(bn, 128) * 4
        tmp = (ru(cin, 32) * ru(bn, 128) * 6
               + bh * ru(wo, 8) * ru(cin, 128) * 2)
        if x_b + w_b + o_b + acc + tmp <= _INT4_CONV_VMEM_BUDGET:
            return bh
        bh //= 2
    return None


def dequant_packed_conv_weights(w_packed: jax.Array, delta_w: jax.Array,
                                zp_wc: jax.Array, kh: int, kw: int,
                                block_n: int,
                                dtype=jnp.bfloat16) -> jax.Array:
    """XLA-side unpack + dequant of a per-tap nibble-packed conv weight
    to full HWIO (padded channels included — callers slice)."""
    half = block_n // 2
    cin = w_packed.shape[1]
    npk = w_packed.shape[2] * 2
    taps = []
    for t in range(kh * kw):
        tiles = [_unpack_int4(w_packed[t, :, j * half:(j + 1) * half])
                 for j in range(npk // block_n)]
        taps.append(jnp.concatenate(tiles, axis=1))
    wq = jnp.stack(taps).astype(jnp.float32)
    w = delta_w[None, None, :] * (wq - zp_wc[None, None, :])
    return w.reshape(kh, kw, cin, npk).astype(dtype)


def int4_conv2d_dequant(x: jax.Array, w_packed: jax.Array,
                        delta_w: jax.Array, zp_wc: jax.Array,
                        kh: int, kw: int,
                        bias: Optional[jax.Array] = None,
                        pads=((1, 1), (1, 1)),
                        block_n: int = 256, block_h: int = 32,
                        out_dtype=jnp.float32) -> jax.Array:
    """Stride-1 conv over NHWC x with packed-int4 weights:
    w_packed (kh*kw, cin, Np//2) from pack_int4 per tap (same block_n),
    delta_w/zp_wc (Np,) per-channel (zp centered at 8). Output channels
    beyond the real cout must carry delta=1/zp_c=0 padding (they are
    sliced off by the caller). Shapes whose resident image cannot fit
    scoped VMEM (see _int4_conv_plan) run an XLA conv on dequantized
    weights instead — those are the activation-dominated convs where
    packing buys no bandwidth anyway."""
    b_, h, w, cin = x.shape
    npk = w_packed.shape[2] * 2
    bn = min(block_n, npk)
    xp = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    ho = hp - kh + 1
    wo = wp - kw + 1
    if bias is None:
        bias = jnp.zeros((npk,), jnp.float32)
    bh = _int4_conv_plan(ho, wo, cin, npk, kh, kw, bn,
                         x.dtype.itemsize, block_h=block_h)
    if bh is None:
        wd = dequant_packed_conv_weights(w_packed, delta_w, zp_wc, kh,
                                         kw, bn, dtype=x.dtype)
        out = jax.lax.conv_general_dilated(
            x, wd, (1, 1), list(pads),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (out + bias[None, None, None, :]).astype(out_dtype)
    grid = (b_, ho // bh, _cdiv(npk, bn))
    kern = functools.partial(_int4_conv_kernel, kh=kh, kw=kw, bh=bh,
                             w=wo, out_dtype=out_dtype)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((1, hp, wp, cin),
                         lambda i, h, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, cin, bn // 2),
                         lambda i, h, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, h, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, h, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, h, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, wo, bn),
                               lambda i, h, j: (i, h, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_, ho, wo, npk), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_ * ho * wo * cin * npk * kh * kw,
            bytes_accessed=(b_ * hp * wp * cin * 2
                            + kh * kw * cin * npk // 2
                            + b_ * ho * wo * npk * 2),
            transcendentals=0),
    )(xp, w_packed,
      delta_w.reshape(1, npk).astype(jnp.float32),
      zp_wc.reshape(1, npk).astype(jnp.float32),
      bias.reshape(1, npk).astype(jnp.float32))
