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
    """Fusable in-kernel: per-tensor scalar grid with uint codes."""
    if p is None:
        return False
    cfg, st = p
    return (cfg.qrange[0] == 0 and jnp.ndim(st["delta"]) == 0
            and jnp.ndim(st["zp"]) == 0)


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

    if _flash_ok(qctx, k.shape[1]):
        interp = jax.default_backend() == "cpu"
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        p_quant = ((pw[1]["delta"], pw[1]["zp"]), pw[0].qrange) \
            if pw is not None else (None, None)
        if all(_scalar_asym(p) for p in (pq, pk, pv)):
            out = flash_attention(
                qt, kt, vt, sm_scale=sm_scale,
                qkv_quant=tuple((p[1]["delta"], p[1]["zp"])
                                for p in (pq, pk, pv)),
                qkv_ranges=tuple(p[0].qrange for p in (pq, pk, pv)),
                p_quant=p_quant[0], qrange=p_quant[1], interpret=interp)
            return out.transpose(0, 2, 1, 3).astype(out_dtype)
        if pq is None and pk is None and pv is None:
            out = flash_attention(
                qt, kt, vt, sm_scale=sm_scale, p_quant=p_quant[0],
                qrange=p_quant[1], interpret=interp)
            return out.transpose(0, 2, 1, 3).astype(out_dtype)
        # mixed/per-channel site configs: fake-quant inputs elementwise,
        # then the (optionally w-quantized) flash kernel
        if qctx is not None:
            q = qctx.qact(sites.get("q"), q) if pq is not None else q
            k = qctx.qact(sites.get("k"), k) if pk is not None else k
            v = qctx.qact(sites.get("v"), v) if pv is not None else v
        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), sm_scale=sm_scale,
            p_quant=p_quant[0], qrange=p_quant[1], interpret=interp)
        return out.transpose(0, 2, 1, 3).astype(out_dtype)

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
