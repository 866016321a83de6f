"""Attention dispatch: fused flash kernels vs materialized einsum.

Every attention in the model zoo is `softmax(fq(q) fq(k)^T * s)
-> fq(softmax) -> @ fq(v)` with per-site act quantizers aqtizer_q/k/v/w
(quant_block.py:273-278, 340-344, 467-471; cross_attn_forward
quant_block.py:214-245). This helper owns all four sites and picks:

- the fused int8 Pallas kernel when all of q/k/v are act-quantized with
  per-tensor asymmetric grids: q/k/v are quantized in VMEM and both
  matmuls run at the int8 MXU rate (the reference fake-quants these
  inputs but still executes fp matmuls);
- the fp/bf16 flash kernel (optionally with the softmax-output quant
  epilogue) when only some sites are active;
- the materialized einsum whenever calibration needs it: activation
  stat collection (act_mode init/ema reads full tensors at each site),
  any context that may be differentiated (no kernel VJP), small
  sequences (kernel grid overhead loses below ~1k key tokens), or CPU.

`QuantCtx.flash` opts a context in; plain FP forwards (qctx=None) use
flash automatically on TPU unless `set_flash("off")`.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .flash_attention import flash_attention

_MODE = "auto"  # "auto" (TPU only) | "on" | "off"

# execute attention matmuls on int8 operands where grids allow (the
# deployed path); False = keep matmuls bf16 and only fake-quant the
# quantizer sites (still bit-equivalent to the reference semantics)
_INT8 = True

# fast-deploy q/k/v quantizer placement: "fqk" = in-kernel fake-quant
# (k/v fq persisted in VMEM scratch, but block_q capped at 256 by the
# scoped-VMEM limit); "xla_fq" = fake-quant q/k/v in XLA (fusable into
# the projection epilogues) + the pquant-only kernel at full 512 tiles
_FAST_ATTN = "fqk"


def set_fast_attn(mode: str) -> None:
    global _FAST_ATTN
    assert mode in ("fqk", "xla_fq"), mode
    _FAST_ATTN = mode

# Below this key length the materialized score matrix fits comfortably
# in cache-sized tiles and XLA's fused einsum+softmax beats the kernel's
# grid overhead (measured on CIFAR-10's 256-token attention). Flash wins
# where it matters: SD/LDM 1024-4096 token self-attention, where the
# (T, T) matrix is the HBM bottleneck.
MIN_FLASH_KV = 1024


def set_flash(mode: str) -> None:
    global _MODE
    assert mode in ("auto", "on", "off"), mode
    _MODE = mode


def set_int8_attention(on: bool) -> None:
    global _INT8
    _INT8 = bool(on)


def _flash_ok(qctx, tk: int = MIN_FLASH_KV) -> bool:
    if _MODE == "off":
        return False
    if _MODE == "auto" and (jax.default_backend() != "tpu"
                            or tk < MIN_FLASH_KV):
        return False
    if qctx is None:
        return True
    return qctx.flash and qctx.act_mode is None and qctx.capture is None


def _site_params(qctx, site):
    """(a_cfg, {delta, zp}) when the act quantizer at ``site`` is live."""
    if qctx is None or site is None or not qctx.use_aq:
        return None
    pol = qctx.policy.get(site)
    st = qctx.astate.get(site)
    if pol is None or not pol.aq or st is None:
        return None
    return pol.a_cfg, st


def _scalar_asym(p) -> bool:
    """Fusable into the int8 kernels: per-tensor scalar grid with uint
    codes that fit int8 after 128-centering — wider grids (e.g.
    --softmax_a_bit 16) would wrap in the .astype(int8) and must take
    the fake-quant paths instead."""
    if p is None:
        return False
    cfg, st = p
    return (cfg.qrange[0] == 0 and cfg.bits <= 8
            and jnp.ndim(st["delta"]) == 0 and jnp.ndim(st["zp"]) == 0)


def _scalar_w(p) -> bool:
    """Fusable as a flash-kernel softmax-output quantizer: per-tensor
    scalar grid (rides SMEM scalars). Width-agnostic — the fqk/pquant
    kernels fake-quant p in f32; only _int8_kernel needs bits<=8."""
    if p is None:
        return True
    cfg, st = p
    return jnp.ndim(st["delta"]) == 0 and jnp.ndim(st["zp"]) == 0


def _int8_materialized(q, k, v, sm_scale, pq, pk, pv, pw, out_dtype):
    """Deployed attention for small T (below the flash gate): both
    matmuls execute int8 with the same exact zero-point algebra as the
    flash kernel (ops/flash_attention.py), but with the (B,H,T,T) score
    matrix materialized — at T<=256 it fits in cache-sized tiles and
    XLA's fused einsum beats kernel grid overhead. Replaces fake-quant
    elementwise passes + bf16 einsums with int8 MXU ops.

    fq(a)·fq(b) = da·db·(a8·b8 - zb'·Σa8 - za'·Σb8 + D·za'·zb')
    with centered codes a8 = a_q - 128, z' = z - 128."""
    from . import int_ops

    (cq, sq), (ck, sk), (cv, sv) = pq, pk, pv
    q8, zq_c = int_ops.quantize_act_int8(q, sq["delta"], sq["zp"], cq)
    k8, zk_c = int_ops.quantize_act_int8(k, sk["delta"], sk["zp"], ck)
    v8, zv_c = int_ops.quantize_act_int8(v, sv["delta"], sv["zp"], cv)
    d = q.shape[-1]
    tk = k.shape[1]
    sim = jnp.einsum("bihd,bjhd->bhij", q8, k8,
                     preferred_element_type=jnp.int32).astype(jnp.float32)
    qsum = jnp.sum(q8.astype(jnp.int32), axis=-1).astype(jnp.float32)
    ksum = jnp.sum(k8.astype(jnp.int32), axis=-1).astype(jnp.float32)
    sim = (sim
           - zk_c * qsum.transpose(0, 2, 1)[:, :, :, None]
           - zq_c * ksum.transpose(0, 2, 1)[:, :, None, :]
           + d * zq_c * zk_c)
    scores = (sq["delta"] * sk["delta"] * sm_scale) * sim
    p = jax.nn.softmax(scores, axis=-1)
    dv_ = sv["delta"]
    if pw is not None:
        cw, sw = pw
        dw, zw = sw["delta"], sw["zp"]
        wnb, wpb = cw.qrange
        p_q = jnp.clip(jnp.round(p * (1.0 / dw)) + zw, wnb, wpb)
        p8 = (p_q - 128.0).astype(jnp.int8)
        out = jnp.einsum("bhij,bjhd->bihd", p8, v8,
                         preferred_element_type=jnp.int32
                         ).astype(jnp.float32)
        psum = jnp.sum(p8.astype(jnp.int32), axis=-1).astype(jnp.float32)
        vsum = jnp.sum(v8.astype(jnp.int32), axis=1).astype(jnp.float32)
        out = (dw * dv_) * (out
                            - zv_c * psum.transpose(0, 2, 1)[:, :, :, None]
                            + (128.0 - zw) * vsum[:, None, :, :]
                            - (128.0 - zw) * zv_c * float(tk))
        return out.astype(out_dtype)
    # no softmax quant: p stays fp (cast like the reference path), PV on
    # dequantized v codes with the zero-point folded out algebraically
    p = p.astype(out_dtype)
    out = jnp.einsum("bhij,bjhd->bihd", p, v8.astype(out_dtype),
                     preferred_element_type=jnp.float32)
    psum = jnp.sum(p.astype(jnp.float32), axis=-1)
    out = dv_ * (out - zv_c * psum.transpose(0, 2, 1)[:, :, :, None])
    return out.astype(out_dtype)


def qsm_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  sm_scale: float, qctx, sites: Dict[str, Optional[str]],
                  out_dtype=None) -> jax.Array:
    """Attention over (B, T, H, D) tensors (H=1 for the DDIM single-head
    block). ``sites``: {"q","k","v","w"} -> act-quant site names (the
    reference's aqtizer_q/k/v/w); quantization of all four sites happens
    HERE, per ``qctx``. q/k arrive pre-scaled when the model scales
    before quantizing (openaimodel.py QKVAttentionLegacy); ``sm_scale``
    is applied to the dequantized scores."""
    out_dtype = out_dtype or q.dtype
    pq = _site_params(qctx, sites.get("q"))
    pk = _site_params(qctx, sites.get("k"))
    pv = _site_params(qctx, sites.get("v"))
    pw = _site_params(qctx, sites.get("w"))

    if _flash_ok(qctx, k.shape[1]) and _scalar_w(pw):
        interp = jax.default_backend() == "cpu"
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        p_quant = ((pw[1]["delta"], pw[1]["zp"]), pw[0].qrange) \
            if pw is not None else (None, None)
        # always_zero grids (the reference softmax quantizer) let the
        # pquant kernel drop the zp sweeps statically
        p_az = bool(pw is not None and pw[0].always_zero)
        # fast-deploy (bf16 carriers): the fqk kernel (in-kernel
        # fake-quant, bf16 matmuls, no zero-point corrections) — the
        # int8 QK matmul gains nothing at contraction dim 40-80 while
        # its corrections cost VPU work (sd 4096x40: fqk 6.8 vs int8
        # 8.7 ms/call). The exact (f32-carrier) deployment keeps the
        # int8 kernel: integer matmuls + exact corrections, no bf16
        # matmul rounding.
        fast = (qctx is not None and qctx.deploy is not None
                and qctx.act_out_dtype == jnp.bfloat16)
        if _INT8 and all(_scalar_asym(p) for p in (pq, pk, pv)) and (
                fast or pw is None or _scalar_asym(pw)):
            # fast mode: in-kernel fake-quant + bf16 matmuls (fqk) —
            # no XLA pre-sweeps, no zero-point corrections; exact mode:
            # full int8 matmuls with exact corrections. Exact mode also
            # requires the softmax quantizer (if any) to fit int8 levels
            # (_int8_kernel centers p codes at 128); a wide pw falls to
            # the fake-quant + pquant-kernel path below.
            if fast and _FAST_ATTN == "xla_fq":
                qf = qctx.qact(sites["q"], qt).astype(qt.dtype)
                kf = qctx.qact(sites["k"], kt).astype(kt.dtype)
                vf = qctx.qact(sites["v"], vt).astype(vt.dtype)
                out = flash_attention(
                    qf, kf, vf, sm_scale=sm_scale, p_quant=p_quant[0],
                    qrange=p_quant[1], p_always_zero=p_az,
                    interpret=interp)
                return out.transpose(0, 2, 1, 3).astype(out_dtype)
            out = flash_attention(
                qt, kt, vt, sm_scale=sm_scale,
                qkv_quant=tuple((p[1]["delta"], p[1]["zp"])
                                for p in (pq, pk, pv)),
                qkv_ranges=tuple(p[0].qrange for p in (pq, pk, pv)),
                p_quant=p_quant[0], qrange=p_quant[1],
                p_always_zero=p_az,
                int8_matmul=not fast, interpret=interp)
            return out.transpose(0, 2, 1, 3).astype(out_dtype)
        if pq is None and pk is None and pv is None:
            out = flash_attention(
                qt, kt, vt, sm_scale=sm_scale, p_quant=p_quant[0],
                qrange=p_quant[1], p_always_zero=p_az,
                interpret=interp)
            return out.transpose(0, 2, 1, 3).astype(out_dtype)
        # mixed/per-channel site configs (non-scalar grids): fake-quant
        # inputs elementwise, then the (optionally w-quantized) flash
        # kernel. (A bf16 score scratch was measured
        # SLOWER than f32 at 512x2048 tiles — the per-element cast
        # overhead exceeds the saved VMEM traffic — so the score_dtype
        # knob stays at its f32 default.)
        if qctx is not None:
            q = qctx.qact(sites.get("q"), q) if pq is not None else q
            k = qctx.qact(sites.get("k"), k) if pk is not None else k
            v = qctx.qact(sites.get("v"), v) if pv is not None else v
        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), sm_scale=sm_scale,
            p_quant=p_quant[0], qrange=p_quant[1], p_always_zero=p_az,
            interpret=interp)
        return out.transpose(0, 2, 1, 3).astype(out_dtype)

    # deployed small-T path: int8 matmuls without the flash kernel.
    # Fast-deploy (bf16 carriers) skips this too — the fake-quant
    # materialized path below, fully fused by XLA, measured 2x faster
    # at CIFAR's 256-token attention (70 vs 135 us/call): at small T
    # the int8 zero-point corrections and extra sweeps dominate the
    # MXU savings. The exact f32 deployment keeps integer matmuls.
    if (_INT8 and qctx is not None and qctx.deploy is not None
            and qctx.act_out_dtype != jnp.bfloat16
            and qctx.act_mode is None and qctx.capture is None
            and all(_scalar_asym(p) for p in (pq, pk, pv))
            and (pw is None or _scalar_asym(pw))):
        return _int8_materialized(q, k, v, sm_scale, pq, pk, pv, pw,
                                  out_dtype)

    # materialized reference path (calibration, grads, small T, CPU)
    if qctx is not None:
        if sites.get("q") is not None:
            q = qctx.qact(sites["q"], q)
        if sites.get("k") is not None:
            k = qctx.qact(sites["k"], k)
        if sites.get("v") is not None:
            v = qctx.qact(sites["v"], v)
    sim = jnp.einsum("bihd,bjhd->bhij", q, k,
                     preferred_element_type=jnp.float32) * sm_scale
    attn = jax.nn.softmax(sim, axis=-1).astype(out_dtype)
    if qctx is not None and sites.get("w") is not None:
        attn = qctx.qact(sites["w"], attn)
    out = jnp.einsum("bhij,bjhd->bihd", attn, v,
                     preferred_element_type=jnp.float32)
    return out.astype(out_dtype)
