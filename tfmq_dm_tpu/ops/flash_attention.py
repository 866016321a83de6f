"""Fused blockwise (flash) attention Pallas kernels, with quantized
variants that execute the attention matmuls in int8 on the MXU.

The reference materializes the full (T, T) attention matrix, fake-quants
the softmax output with `aqtizer_w`, and fake-quants the matmul inputs
with `aqtizer_q/k/v` — but still executes everything in fp
(quant_block.py:214-245, 273-278, 303-354). On TPU these kernels never
write the score matrix to HBM, and in deployment they run both matmuls
at the int8 MXU rate:

- `flash_attention(...)`                       one-pass online-softmax.
- `flash_attention(..., p_quant=...)`          softmax-output fake-quant
  (aqtizer_w) applied to exact *normalized* probabilities, which cannot
  ride one-pass rescaling (non-linear in the running denominator): pass
  1 computes row max/denominator, pass 2 re-reads K, quantizes exact
  probabilities and accumulates p_fq @ V.
- `flash_attention(..., qkv_quant=..., p_quant=...)`  the full TFMQ
  deployment kernel: q/k/v are quantized to their act grids in VMEM
  (never materialized in HBM), QK runs int8 with exact rank-1 zero-point
  corrections, and PV runs int8 between softmax levels and v codes:

    fq(a)·fq(b) = da·db · (a'·b' - zb'·rowsum(a') - za'·colsum(b')
                           + D·za'·zb')

  with centered int8 codes a' = a_q - 2^{b-1} (same algebra as
  ops/int_ops.py). Exactly bit-matches fake-quant + fp matmul up to fp
  summation order.

All matmuls accumulate fp32 from native operand dtype (bf16 or int8) —
the MXU-native modes; upcasting operands to fp32 falls off the MXU fast
path. Forward-only: calibration paths that need gradients or activation
stats keep the materialized einsum (see ops/attention.py dispatch).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mask_cols(s, kb, block_k, tk_actual, nk=None):
    """Mask score columns that are Tk padding (last k block only).
    When Tk is tile-aligned (the static common case — SD self-attn
    4096 % 2048 == 0) there is no padding and the iota+select sweeps
    vanish from the kernel entirely."""
    if nk is not None and tk_actual == nk * block_k:
        return s
    col = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    return jnp.where(col < tk_actual, s, NEG_INF)


def _fq(x, delta, zp, nb, pb, dtype):
    """In-kernel fake-quant; bit-matches quantizer.fake_quant (f32
    q/dq arithmetic, result cast to the carrier dtype)."""
    xf = x.astype(jnp.float32)
    xq = jnp.clip(jnp.round(xf * (1.0 / delta)) + zp, nb, pb)
    return (delta * (xq - zp)).astype(dtype)


def _quant_i8(x, delta, zp, nb, pb):
    """Centered int8 act codes: clip(round(x/delta)+zp, nb, pb) - 128."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / delta)) + zp,
                  nb, pb)
    return (xq - 128.0).astype(jnp.int8)


def _fp_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k, nk, tk_actual,
               sm_scale, out_dtype):
    """One-pass online-softmax flash attention for one (bh, q-block)."""
    q = q_ref[0]
    bm, d = q.shape

    def body(kb, carry):
        m, l, acc = carry
        ks = k_ref[0, pl.ds(kb * block_k, block_k), :]
        vs = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = _mask_cols(s, kb, block_k, tk_actual, nk)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    m0 = jnp.full((bm, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bm, 1), jnp.float32)
    a0 = jnp.zeros((bm, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(out_dtype)


def _quant_kernel(dz_ref, q_ref, k_ref, v_ref, o_ref, s_scr, *,
                  block_k, nk, tk_actual, sm_scale, nb, pb, out_dtype,
                  score_dtype=jnp.float32, zp_zero=False):
    """Softmax-output quant (aqtizer_w) over exact normalized
    probabilities, which cannot ride one-pass rescaling (round() is
    non-linear in the running denominator). Two passes, both fused:

    1. fill: QK scores -> e = exp(s - m_running) into a (block_q, Tk)
       VMEM scratch while tracking the online (row max, rescaled
       exp-sum); the per-block running maxes stay live as SSA values
       (the loops unroll over the static, small nk — 2 at SD 4096 with
       2048-wide k tiles);
    2. pv: per key block, rebase the cached e to the FINAL (m, l) with
       one row-scalar factor exp(m_blk - m) * inv — no second
       full-width exp sweep (the transcendental was a large share of
       the pquant-vs-fp gap at SD shapes) — quantize in registers,
       matmul.
    """
    q = q_ref[0]
    bm, d = q.shape
    delta = dz_ref[0]
    zp = dz_ref[1]

    m = jnp.full((bm, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bm, 1), jnp.float32)
    m_blk = []
    for kb in range(nk):
        ks = k_ref[0, kb * block_k:(kb + 1) * block_k, :]
        s = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = _mask_cols(s, kb, block_k, tk_actual, nk)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # bf16 scratch (fast mode) halves the dominant VMEM scratch
        # traffic; e is ROUNDED before summing so the pv pass rebases a
        # consistent denominator
        e = jnp.exp(s - m_new).astype(score_dtype).astype(jnp.float32)
        s_scr[:, kb * block_k:(kb + 1) * block_k] = e.astype(score_dtype)
        l = l * jnp.exp(m - m_new) + jnp.sum(e, axis=-1, keepdims=True)
        m = m_new
        m_blk.append(m_new)

    # one exact IEEE divide per ROW, then a broadcast multiply — a
    # full-width f32 divide runs at a fraction of VPU mul throughput
    inv = 1.0 / (l * delta)

    acc = jnp.zeros((bm, d), jnp.float32)
    for kb in range(nk):
        vs = v_ref[0, kb * block_k:(kb + 1) * block_k, :]
        e = s_scr[:, kb * block_k:(kb + 1) * block_k].astype(jnp.float32)
        f = jnp.exp(m_blk[kb] - m) * inv                   # (bm, 1)
        # the delta dequant rides AFTER the matmul (levels 0..255 are
        # exact in bf16, so p_q - zp loses nothing as an MXU operand,
        # while delta*(p_q-zp) rounded to bf16 did); always_zero grids
        # (the reference softmax quantizer) drop the zp sweeps and the
        # lower clip (round(e*f) >= 0) statically
        if zp_zero:
            p_lv = jnp.minimum(jnp.round(e * f), pb)
        else:
            p_lv = jnp.clip(jnp.round(e * f) + zp, nb, pb) - zp
        acc = acc + jax.lax.dot_general(
            p_lv.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0] = (delta * acc).astype(out_dtype)


def _fqk_kernel(sc_ref, q_ref, k_ref, v_ref, o_ref, s_scr, kf_scr,
                vf_scr, vs_scr, *, block_k, nk, tk_actual, sm_scale,
                ranges, w_range, quant_w, out_dtype, zp_zero=False,
                int8_pv=False):
    """Fast-deploy kernel: q/k/v fake-quantized IN-KERNEL (saves three
    full XLA elementwise sweeps over the activations), bf16 matmuls,
    optional softmax-output quant with the fused e-scratch two-pass
    structure of _quant_kernel (exp once in fill, row-scalar rebase in
    pv). k/v are fq'd ONCE per (b,h) into persistent VMEM scratch on the
    first q-block — TPU grid cells run sequentially with the q-block as
    the minor dimension, so the scratch survives across the row's cells
    (a per-cell fq re-did that work nq times and gave the in-kernel
    variant no net win). sc_ref (SMEM): [dq, zq, dk, zk, dv, zv, dw,
    zw].

    ``int8_pv``: with the softmax-output quantizer active and both its
    levels and the v grid fitting int8, the PV matmul runs int8 on the
    MXU — unlike QK (contraction dim = head dim 40-80, where int8 buys
    nothing), PV contracts over Tk = 1024-4096 tokens, so the int8 rate
    is real. v codes live centered-int8 in the scratch (half the bf16
    bytes) with exact rank-1 zero-point corrections (the _int8_kernel PV
    algebra); the p levels 0..255 are exact integers by construction."""
    dq, zq = sc_ref[0], sc_ref[1]
    dk, zk = sc_ref[2], sc_ref[3]
    dv, zv = sc_ref[4], sc_ref[5]
    dw, zw = sc_ref[6], sc_ref[7]
    (qnb, qpb), (knb, kpb), (vnb, vpb) = ranges
    zv_c = zv - 128.0
    qraw = q_ref[0]
    mdt = qraw.dtype
    q = _fq(qraw, dq, zq, qnb, qpb, mdt)
    bm, d = q.shape

    @pl.when(pl.program_id(1) == 0)
    def _prep():
        def one(kb, _):
            sl = pl.ds(kb * block_k, block_k)
            kf_scr[sl, :] = _fq(k_ref[0, sl, :], dk, zk, knb, kpb, mdt)
            if int8_pv:
                v8 = _quant_i8(v_ref[0, sl, :], dv, zv, vnb, vpb)
                vf_scr[sl, :] = v8
                vs_scr[pl.ds(kb, 1), :] = jnp.sum(
                    v8.astype(jnp.int32), axis=0,
                    keepdims=True).astype(jnp.float32)
            else:
                vf_scr[sl, :] = _fq(v_ref[0, sl, :], dv, zv, vnb, vpb,
                                    mdt)
            return 0
        jax.lax.fori_loop(0, nk, one, 0)

    m = jnp.full((bm, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bm, 1), jnp.float32)
    m_blk = []
    for kb in range(nk):
        ks = kf_scr[kb * block_k:(kb + 1) * block_k, :]
        s = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = _mask_cols(s, kb, block_k, tk_actual, nk)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp(s - m_new)
        s_scr[:, kb * block_k:(kb + 1) * block_k] = e
        l = l * jnp.exp(m - m_new) + jnp.sum(e, axis=-1, keepdims=True)
        m = m_new
        m_blk.append(m_new)

    acc = jnp.zeros((bm, d), jnp.float32)
    if quant_w and int8_pv:
        wnb, wpb = w_range
        inv = 1.0 / (l * dw)
        for kb in range(nk):
            v8 = vf_scr[kb * block_k:(kb + 1) * block_k, :]
            e = s_scr[:, kb * block_k:(kb + 1) * block_k]
            f = jnp.exp(m_blk[kb] - m) * inv
            if zp_zero:
                p_q = jnp.minimum(jnp.round(e * f), wpb)
            else:
                p_q = jnp.clip(jnp.round(e * f) + zw, wnb, wpb)
            p8 = (p_q - 128.0).astype(jnp.int8)
            psum = jnp.sum(p8.astype(jnp.int32), axis=-1,
                           keepdims=True).astype(jnp.float32)
            pvi = jax.lax.dot_general(
                p8, v8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            # Σ_j (p_q - zw)(v_q - zv) with p8 = p_q - 128, v8 = v_q - 128
            acc = acc + (pvi - zv_c * psum
                         + (128.0 - zw) * vs_scr[kb, :][None, :]
                         - (128.0 - zw) * zv_c * float(block_k))
        acc = (dw * dv) * acc
    elif quant_w:
        wnb, wpb = w_range
        inv = 1.0 / (l * dw)
        for kb in range(nk):
            vs = vf_scr[kb * block_k:(kb + 1) * block_k, :]
            e = s_scr[:, kb * block_k:(kb + 1) * block_k]
            f = jnp.exp(m_blk[kb] - m) * inv
            if zp_zero:
                p_lv = jnp.minimum(jnp.round(e * f), wpb)
            else:
                p_lv = jnp.clip(jnp.round(e * f) + zw, wnb, wpb) - zw
            acc = acc + jax.lax.dot_general(
                p_lv.astype(mdt), vs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = dw * acc
    else:
        inv = 1.0 / l
        for kb in range(nk):
            vs = vf_scr[kb * block_k:(kb + 1) * block_k, :]
            e = s_scr[:, kb * block_k:(kb + 1) * block_k]
            p = e * (jnp.exp(m_blk[kb] - m) * inv)
            acc = acc + jax.lax.dot_general(
                p.astype(mdt), vs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(out_dtype)


def _int8_kernel(sc_ref, q_ref, kt_ref, v_ref, qs_ref, ks_ref, vs_ref,
                 o_ref, s_scr, *, block_k, nk, tk_actual, sm_scale,
                 d_actual, w_range, quant_w, out_dtype):
    """Full deployment kernel over PRE-quantized operands: q8 (bq, d),
    kT8 (d, tk) — K transposed in HBM so both matmuls are standard
    (M,K)x(K,N) int8 MXU ops (an in-kernel int8 transpose falls off the
    fast path) — v8 (tk, d), plus precomputed row sums for the exact
    rank-1 zero-point corrections. Optional softmax-output quant as
    integer levels, so PV stays int8.

    sc_ref (SMEM, fp32): [dq, zq, dk, zk, dv, zv, dw, zw].
    qs_ref: (bq, 1) fp32 Σ_d q8;  ks_ref: (1, tk) fp32 Σ_d k8;
    vs_ref: (nk, d) fp32 per-key-block column sums of v8 (precomputed
    outside — an in-kernel reduction repeats per q-block grid cell).
    """
    dq, zq = sc_ref[0], sc_ref[1]
    dk, zk = sc_ref[2], sc_ref[3]
    dv, zv = sc_ref[4], sc_ref[5]
    dw, zw = sc_ref[6], sc_ref[7]
    zq_c, zk_c, zv_c = zq - 128.0, zk - 128.0, zv - 128.0
    q8 = q_ref[0]
    bm = q8.shape[0]
    qsum = qs_ref[0]                                       # (bm, 1)

    def scores(kb):
        kt = kt_ref[0, :, pl.ds(kb * block_k, block_k)]
        acc = jax.lax.dot_general(
            q8, kt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        ksum = ks_ref[0, :, pl.ds(kb * block_k, block_k)]  # (1, bk)
        # fq(q)·fq(k) = dq dk (q8·k8 - zk'·Σq8 - zq'·Σk8 + D zq' zk')
        s = dq * dk * (acc - zk_c * qsum - zq_c * ksum
                       + d_actual * zq_c * zk_c) * sm_scale
        return _mask_cols(s, kb, block_k, tk_actual, nk)

    if quant_w:
        wnb, wpb = w_range

        # e-scratch two-pass structure as in _quant_kernel: fill caches
        # e = exp(s - m_running) with per-block maxes live as SSA
        # values; pv rebases with one row-scalar factor — no second
        # full-width exp sweep
        m = jnp.full((bm, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((bm, 1), jnp.float32)
        m_blk = []
        for kb in range(nk):
            s = scores(kb)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            e = jnp.exp(s - m_new)
            s_scr[:, kb * block_k:(kb + 1) * block_k] = e
            l = l * jnp.exp(m - m_new) + jnp.sum(e, axis=-1,
                                                 keepdims=True)
            m = m_new
            m_blk.append(m_new)
        inv = 1.0 / (l * dw)   # one divide per row (see _quant_kernel)

        acc = jnp.zeros((bm, q8.shape[1]), jnp.float32)
        for kb in range(nk):
            e = s_scr[:, kb * block_k:(kb + 1) * block_k]
            f = jnp.exp(m_blk[kb] - m) * inv
            # quantize to centered int8 levels in registers; the int8
            # MXU matmul reads the converted block directly
            p_q = jnp.clip(jnp.round(e * f) + zw, wnb, wpb)
            p8 = (p_q - 128.0).astype(jnp.int8)
            psum = jnp.sum(p8.astype(jnp.int32), axis=-1,
                           keepdims=True).astype(jnp.float32)
            v8 = v_ref[0, kb * block_k:(kb + 1) * block_k, :]
            pvi = jax.lax.dot_general(
                p8, v8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            vsum = vs_ref[0, kb:kb + 1, :]                 # (1, d)
            # Σ_j dw·dv·(p_q - zw)(v_q - zv), with p8 = p_q - 128 and
            # v8 = v_q - 128:  (p8 + (128-zw))·(v8 - zv')
            #  = p8·v8 - zv'·Σ_j p8 + (128-zw)·Σ_j v8
            #    - (128-zw)·zv'·block_k
            # (masked/padded columns have p_q == zw, contributing 0)
            corr = (pvi - zv_c * psum + (128.0 - zw) * vsum
                    - (128.0 - zw) * zv_c * float(block_k))
            acc = acc + dw * dv * corr
        o_ref[0] = acc.astype(out_dtype)
    else:
        # no softmax quant: probabilities stay fp; PV runs int8 between
        # rescaled p levels and v8? No — p is continuous here, so PV is
        # p (native dtype) x dequantized v8, dequant fused in-kernel.
        def body(kb, carry):
            m, l, acc = carry
            s = scores(kb)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            v8 = v_ref[0, pl.ds(kb * block_k, block_k), :]
            vdq = (dv * (v8.astype(jnp.float32) - zv_c)
                   ).astype(out_dtype)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(out_dtype), vdq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l, acc

        m0 = jnp.full((bm, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bm, 1), jnp.float32)
        a0 = jnp.zeros((bm, q8.shape[1]), jnp.float32)
        _, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, a0))
        o_ref[0] = (acc / l).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "qrange", "ranges", "block_q",
                              "block_k", "interpret", "mode",
                              "score_dtype", "zp_zero", "use_int8_pv"))
def _flash_call(q, k, v, dz, sc, *, sm_scale, qrange, ranges, block_q,
                block_k, interpret, mode, score_dtype=jnp.float32,
                zp_zero=False, use_int8_pv=False):
    bh, tq, d = q.shape
    tk = k.shape[1]
    tqp = _round_up(tq, block_q)
    tkp = _round_up(tk, block_k)
    # D is NOT padded: Mosaic pads the lane dim in VMEM; padding in HBM
    # would materialize a full copy (6+ ms/step at SD scale).
    qp = jnp.pad(q, ((0, 0), (0, tqp - tq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, tkp - tk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, tkp - tk), (0, 0)))
    nk = tkp // block_k
    grid = (bh, tqp // block_q)
    tensor_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tkp, d), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tkp, d), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bh, tqp, d), q.dtype)
    cost = pl.CostEstimate(
        flops=(2 if mode == "fp" else 3) * 2 * bh * tqp * tkp * d,
        bytes_accessed=4 * bh * (tqp * d * 2 + tkp * d * 2),
        transcendentals=bh * tqp * tkp * (1 if mode == "fp" else 2))
    if mode == "fp":
        kern = functools.partial(
            _fp_kernel, block_k=block_k, nk=nk, tk_actual=tk,
            sm_scale=sm_scale, out_dtype=q.dtype)
        out = pl.pallas_call(
            kern, grid=grid, in_specs=tensor_specs, out_specs=out_spec,
            out_shape=out_shape, cost_estimate=cost,
            interpret=interpret)(qp, kp, vp)
    elif mode == "fqk":
        # int8 PV: softmax levels and v codes both fit centered int8 —
        # the Tk-contraction matmul runs at the int8 MXU rate and the v
        # scratch halves. QK stays bf16 (head-dim contraction gains
        # nothing from int8; see attention.py dispatch note).
        int8_pv = (use_int8_pv and qrange is not None
                   and qrange[0] == 0 and qrange[1] <= 255
                   and ranges[2][0] == 0 and ranges[2][1] <= 255)
        kern = functools.partial(
            _fqk_kernel, block_k=block_k, nk=nk, tk_actual=tk,
            sm_scale=sm_scale,
            ranges=tuple((float(a), float(b)) for a, b in ranges),
            w_range=(None if qrange is None else
                     (float(qrange[0]), float(qrange[1]))),
            quant_w=qrange is not None, out_dtype=q.dtype,
            zp_zero=zp_zero, int8_pv=int8_pv)
        out = pl.pallas_call(
            kern, grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + tensor_specs,
            out_specs=out_spec, out_shape=out_shape, cost_estimate=cost,
            scratch_shapes=[pltpu.VMEM((block_q, tkp), jnp.float32),
                            pltpu.VMEM((tkp, d), q.dtype),
                            pltpu.VMEM((tkp, d),
                                       jnp.int8 if int8_pv else q.dtype),
                            pltpu.VMEM((nk, d), jnp.float32)],
            interpret=interpret)(sc, qp, kp, vp)
    elif mode == "pquant":
        nb, pb = qrange
        kern = functools.partial(
            _quant_kernel, block_k=block_k, nk=nk, tk_actual=tk,
            sm_scale=sm_scale, nb=float(nb), pb=float(pb),
            out_dtype=q.dtype, score_dtype=score_dtype,
            zp_zero=zp_zero)
        out = pl.pallas_call(
            kern, grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + tensor_specs,
            out_specs=out_spec, out_shape=out_shape, cost_estimate=cost,
            scratch_shapes=[pltpu.VMEM((block_q, tkp), score_dtype)],
            interpret=interpret)(dz, qp, kp, vp)
    else:  # "int8"
        # Quantize to int8 codes OUTSIDE the kernel (one fused XLA
        # elementwise pass; halves kernel DMA) and pre-transpose K so
        # both matmuls are standard (M,K)x(K,N) — an in-kernel int8
        # transpose falls off the MXU fast path.
        (qnb, qpb), (knb, kpb), (vnb, vpb) = ranges
        q8 = _quant_i8(qp, sc[0], sc[1], qnb, qpb)
        k8 = _quant_i8(kp, sc[2], sc[3], knb, kpb)
        v8 = _quant_i8(vp, sc[4], sc[5], vnb, vpb)
        kt8 = jnp.swapaxes(k8, 1, 2)
        qsum = jnp.sum(q8.astype(jnp.int32), axis=-1,
                       keepdims=True).astype(jnp.float32)
        ksum = jnp.sum(k8.astype(jnp.int32),
                       axis=-1).astype(jnp.float32)[:, None, :]
        if qrange is not None:
            vsum = jnp.sum(
                v8.reshape(bh, nk, block_k, d).astype(jnp.int32),
                axis=2).astype(jnp.float32)              # (bh, nk, d)
            nkv = nk
        else:
            # the kernel's non-quant_w branch never reads vs_ref; a
            # 1-block dummy avoids a full reduction over v8 + per-cell
            # DMA for an unused value
            vsum = jnp.zeros((bh, 1, d), jnp.float32)
            nkv = 1
        kern = functools.partial(
            _int8_kernel, block_k=block_k, nk=nk, tk_actual=tk,
            sm_scale=sm_scale, d_actual=float(d),
            w_range=(None if qrange is None else
                     (float(qrange[0]), float(qrange[1]))),
            quant_w=qrange is not None, out_dtype=q.dtype)
        out = pl.pallas_call(
            kern, grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, tkp), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tkp, d), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tkp), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkv, d), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec, out_shape=out_shape, cost_estimate=cost,
            scratch_shapes=[pltpu.VMEM((block_q, tkp), jnp.float32)],
            interpret=interpret)(sc, q8, kt8, v8, qsum, ksum, vsum)
    return out[:, :tq, :]


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    sm_scale: float = 1.0,
                    p_quant: Optional[Tuple] = None,
                    qkv_quant: Optional[Tuple] = None,
                    qrange: Optional[Tuple[int, int]] = None,
                    qkv_ranges: Optional[Tuple] = None,
                    int8_matmul: bool = True,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    score_dtype=jnp.float32,
                    p_always_zero: bool = False,
                    int8_pv: bool = False,
                    interpret: bool = False) -> jax.Array:
    """Blockwise attention over (B, H, T, D) tensors.

    ``p_quant``: optional (delta, zp) traced scalars — fake-quants the
    softmax probabilities exactly like `fake_quant(p, delta, zp,
    QCfg(...))` before the value matmul (the reference's `aqtizer_w`).
    ``qrange`` is its clamp range, default (0, 255) (asymmetric /
    always_zero).

    ``qkv_quant``: optional ((dq,zq), (dk,zk), (dv,zv)) traced scalars —
    the aqtizer_q/k/v grids. When given, q/k/v are quantized in-kernel
    and BOTH matmuls execute int8 on the MXU with exact zero-point
    corrections. ``qkv_ranges``: clamp ranges, default asymmetric
    (0, 255) each.

    ``int8_matmul=False`` (with qkv_quant) selects the fast-deploy
    kernel instead: q/k/v fake-quantized in-kernel on load, bf16
    matmuls — no XLA pre-sweeps, no zero-point corrections. Faster at
    diffusion head dims; exact deployments keep int8.
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)
    # Default tiles are LARGE (512x2048): per-cell overheads (pipeline
    # ramp, k/v block re-reads, fori trip bookkeeping) dominate at these
    # head dims well before VMEM pressure does — measured at SD 4096-
    # token self-attention: pquant 11.7 -> 6.1 ms/call, int8 13.9 ->
    # 8.7, fp 7.2 -> 4.4 vs the conventional 128x512 tiling. The fp32
    # score scratch at (512, 4096) is 8 MB of the 128 MB VMEM.
    if block_q is None:
        # fqk carries two extra (Tk, D) fq scratches; 256 keeps the
        # scoped-VMEM stack under the 16 MB compiler limit at T=4096
        # (and measured within 4% of 512 tiles)
        block_q = 256 if (qkv_quant is not None
                          and not int8_matmul) else 512
    if block_k is None:
        block_k = 2048
    bq = min(block_q, _round_up(tq, 128))
    bk = min(block_k, _round_up(tk, 128))
    if qrange is None and p_quant is not None:
        qrange = (0, 255)
    if qkv_quant is not None:
        if qkv_ranges is None:
            qkv_ranges = ((0, 255),) * 3
        (dq_, zq_), (dk_, zk_), (dv_, zv_) = qkv_quant
        dw_, zw_ = p_quant if p_quant is not None else (1.0, 0.0)
        sc = jnp.stack([jnp.asarray(a, jnp.float32).reshape(())
                        for a in (dq_, zq_, dk_, zk_, dv_, zv_,
                                  dw_, zw_)])
        out = _flash_call(qf, kf, vf, None, sc, sm_scale=float(sm_scale),
                          qrange=None if p_quant is None
                          else tuple(qrange),
                          ranges=tuple(tuple(r) for r in qkv_ranges),
                          block_q=bq, block_k=bk, interpret=interpret,
                          mode="int8" if int8_matmul else "fqk",
                          zp_zero=p_always_zero, use_int8_pv=int8_pv)
    elif p_quant is not None:
        delta, zp = p_quant
        dz = jnp.stack([jnp.asarray(delta, jnp.float32).reshape(()),
                        jnp.asarray(zp, jnp.float32).reshape(())])
        out = _flash_call(qf, kf, vf, dz, None, sm_scale=float(sm_scale),
                          qrange=tuple(qrange), ranges=None,
                          block_q=bq, block_k=bk, interpret=interpret,
                          mode="pquant", score_dtype=score_dtype,
                          zp_zero=p_always_zero)
    else:
        out = _flash_call(qf, kf, vf, None, None,
                          sm_scale=float(sm_scale), qrange=None,
                          ranges=None, block_q=bq, block_k=bk,
                          interpret=interpret, mode="fp")
    return out.reshape(b, h, tq, d)
