"""Fused blockwise (flash) attention Pallas kernels, with an optional
softmax-output fake-quant epilogue.

The reference materializes the full (T, T) attention matrix and then
quantizes the softmax output with a dedicated `aqtizer_w`
(quant_block.py:273-278, 340-344; cross_attn_forward quant_block.py:
214-245). On TPU that materialization is the HBM bottleneck at SD scale
(64x64 = 4096 tokens). These kernels never write the score matrix to HBM:

- `flash_attention(...)`            one-pass online-softmax attention.
- `flash_attention(..., p_quant=)`  TWO-pass variant that applies the
  reference's softmax-output fake-quant to the *normalized* probabilities
  inside the kernel:  p_fq = delta * (clip(round(p/delta) + zp, 0, 2^b-1)
  - zp)  — bit-matching `quantizer.fake_quant` with the asymmetric /
  `always_zero` config used for `softmax_a_bit` — then accumulates
  p_fq @ V. Fake-quant of a normalized probability cannot ride the
  one-pass rescaling trick (it is non-linear in the running renormalizer),
  so pass 1 computes the row max/denominator and pass 2 re-reads K to
  quantize exact probabilities. Still O(Tq) HBM traffic.

Both kernels are forward-only: calibration paths that need gradients or
activation statistics (AdaRound act phase, FSC init/EMA) keep the
materialized einsum implementation; see ops/attention.py for dispatch.
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


def _mask_cols(s, kb, block_k, tk_actual):
    """Mask score columns that are Tk padding (last k block only)."""
    col = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    return jnp.where(col < tk_actual, s, NEG_INF)


def _fp_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k, nk, tk_actual,
               sm_scale, out_dtype):
    """One-pass online-softmax flash attention for one (bh, q-block)."""
    q = q_ref[0].astype(jnp.float32)
    bm, d = q.shape

    def body(kb, carry):
        m, l, acc = carry
        ks = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        vs = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = _mask_cols(s, kb, block_k, tk_actual)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, vs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    m0 = jnp.full((bm, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bm, 1), jnp.float32)
    a0 = jnp.zeros((bm, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(out_dtype)


def _quant_kernel(dz_ref, q_ref, k_ref, v_ref, o_ref, *, block_k, nk,
                  tk_actual, sm_scale, nb, pb, out_dtype):
    """Two-pass: (1) row max + denominator; (2) fake-quant the normalized
    probabilities (aqtizer_w semantics) and accumulate p_fq @ V."""
    q = q_ref[0].astype(jnp.float32)
    bm, d = q.shape
    delta = dz_ref[0]
    zp = dz_ref[1]

    def scores(kb):
        ks = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        return _mask_cols(s, kb, block_k, tk_actual)

    def pass1(kb, carry):
        m, l = carry
        s = scores(kb)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(s - m_new), axis=-1,
                                             keepdims=True)
        return m_new, l

    m0 = jnp.full((bm, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bm, 1), jnp.float32)
    m, l = jax.lax.fori_loop(0, nk, pass1, (m0, l0))

    def pass2(kb, acc):
        s = scores(kb)
        p = jnp.exp(s - m) / l                # exact softmax prob
        p_q = jnp.clip(jnp.round(p / delta) + zp, nb, pb)
        p_fq = delta * (p_q - zp)             # quantizer.fake_quant
        vs = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        return acc + jax.lax.dot_general(
            p_fq, vs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, nk, pass2, jnp.zeros((bm, d), jnp.float32))
    o_ref[0] = acc.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "bits", "qrange", "block_q",
                              "block_k", "interpret"))
def _flash_call(q, k, v, dz, *, sm_scale, bits, qrange, block_q, block_k,
                interpret):
    bh, tq, d = q.shape
    tk = k.shape[1]
    dp = _round_up(d, 128)
    tqp = _round_up(tq, block_q)
    tkp = _round_up(tk, block_k)
    qp = jnp.pad(q, ((0, 0), (0, tqp - tq), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, tkp - tk), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, tkp - tk), (0, dp - d)))
    nk = tkp // block_k
    grid = (bh, tqp // block_q)
    tensor_specs = [
        pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tkp, dp), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tkp, dp), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=(2 if dz is None else 3) * 2 * bh * tqp * tkp * dp,
        bytes_accessed=4 * bh * (tqp * dp * 2 + tkp * dp * 2),
        transcendentals=bh * tqp * tkp * (1 if dz is None else 2))
    if dz is None:
        kern = functools.partial(
            _fp_kernel, block_k=block_k, nk=nk, tk_actual=tk,
            sm_scale=sm_scale, out_dtype=q.dtype)
        out = pl.pallas_call(
            kern, grid=grid, in_specs=tensor_specs, out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((bh, tqp, dp), q.dtype),
            cost_estimate=cost, interpret=interpret)(qp, kp, vp)
    else:
        nb, pb = qrange
        kern = functools.partial(
            _quant_kernel, block_k=block_k, nk=nk, tk_actual=tk,
            sm_scale=sm_scale, nb=float(nb), pb=float(pb),
            out_dtype=q.dtype)
        out = pl.pallas_call(
            kern, grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + tensor_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((bh, tqp, dp), q.dtype),
            cost_estimate=cost, interpret=interpret)(dz, qp, kp, vp)
    return out[:, :tq, :d]


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    sm_scale: float = 1.0,
                    p_quant: Optional[Tuple] = None,
                    bits: int = 8,
                    qrange: Optional[Tuple[int, int]] = None,
                    block_q: int = 128, block_k: int = 128,
                    interpret: bool = False) -> jax.Array:
    """Blockwise attention over (B, H, T, D) tensors.

    ``p_quant``: optional (delta, zp) traced scalars — fake-quants the
    softmax probabilities exactly like `fake_quant(p, delta, zp, QCfg(
    bits, asymmetric/always_zero))` before the value matmul (the
    reference's `aqtizer_w`, quant_block.py:273-278). ``qrange`` defaults
    to the asymmetric/always_zero clamp (0, 2^bits - 1).
    Head dim and sequence lengths are padded internally; any D works.
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)
    bq = min(block_q, _round_up(tq, 128))
    bk = min(block_k, _round_up(tk, 128))
    if p_quant is None:
        dz = None
    else:
        delta, zp = p_quant
        dz = jnp.stack([jnp.asarray(delta, jnp.float32).reshape(()),
                        jnp.asarray(zp, jnp.float32).reshape(())])
    if qrange is None:
        qrange = (0, 2 ** bits - 1)
    out = _flash_call(qf, kf, vf, dz, sm_scale=float(sm_scale), bits=bits,
                      qrange=tuple(qrange), block_q=bq, block_k=bk,
                      interpret=interpret)
    return out.reshape(b, h, tq, d)
