"""Attention dispatch: fused flash kernel vs materialized einsum.

Every attention in the model zoo is `softmax(q k^T * s) [fake-quant] v`
with an optional softmax-output act quantizer `aqtizer_w`
(quant_block.py:273-278, 340-344, 467-471). This helper picks:

- the fused Pallas flash kernel (ops/flash_attention.py) on TPU for
  forward-only paths — FP sampling, fake-quant/deployed inference —
  where it removes the O(T^2) score-matrix HBM roundtrip the reference
  always pays;
- the materialized einsum path whenever calibration needs it: activation
  stat collection (act_mode init/ema reads the full softmax output) and
  any context that may be differentiated (the kernels define no VJP), or
  when running on CPU.

`QuantCtx.flash` opts a context in; plain FP forwards (qctx=None) use
flash automatically on TPU unless `set_flash("off")`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .flash_attention import flash_attention

_MODE = "auto"  # "auto" (TPU only) | "on" | "off"

# Below this key length the materialized score matrix fits comfortably in
# cache/VMEM-sized tiles and XLA's fused einsum+softmax beats the kernel's
# grid overhead (measured on CIFAR-10's 256-token attention: the kernel
# costs ~6x the einsum). Flash wins where it matters: SD/LDM 1024-4096
# token self-attention, where the (T, T) matrix is the HBM bottleneck.
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


def qsm_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  sm_scale: float, qctx, w_site: Optional[str],
                  out_dtype=None) -> jax.Array:
    """Attention over (B, T, H, D) tensors (H=1 for the DDIM single-head
    block) with the reference's softmax-output quant site ``w_site``
    applied per ``qctx``. q/k/v arrive already act-quantized by the
    caller (aqtizer_q/k/v are elementwise and stay at the call site)."""
    out_dtype = out_dtype or q.dtype
    pol = qctx.policy.get(w_site) if qctx is not None else None
    st = qctx.astate.get(w_site) if qctx is not None else None

    if _flash_ok(qctx, k.shape[1]):
        p_quant = None
        qrange = None
        if (qctx is not None and qctx.use_aq and pol is not None
                and pol.aq and st is not None):
            p_quant = (st["delta"], st["zp"])
            qrange = pol.a_cfg.qrange
        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), sm_scale=sm_scale, p_quant=p_quant,
            qrange=qrange,
            interpret=jax.default_backend() == "cpu")
        return out.transpose(0, 2, 1, 3).astype(out_dtype)

    sim = jnp.einsum("bihd,bjhd->bhij", q, k,
                     preferred_element_type=jnp.float32) * sm_scale
    attn = jax.nn.softmax(sim, axis=-1).astype(out_dtype)
    if qctx is not None and w_site is not None:
        attn = qctx.qact(w_site, attn)
    out = jnp.einsum("bhij,bjhd->bihd", attn, v,
                     preferred_element_type=jnp.float32)
    return out.astype(out_dtype)
