"""Quantized-inference wiring: build the per-step model callback for the
scan samplers from a calibration artifact.

The reference swaps activation params by calling ``load_state_dict`` on
every denoising step (denoising.py:26-29; ddpm.py:1403-1405 — a host
round-trip per step). Here the FSC state is a batched array pytree and the
swap is a `dynamic_index` inside the jitted scan.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

from .adapter import ModelAdapter
from .context import QuantCtx
from .fsc import pack_fsc, slice_fsc, unpack_fsc


def make_model_fn(adapter: ModelAdapter, params, wstate: Optional[Dict],
                  astate_batched: Optional[Dict] = None, *,
                  use_wq: bool = True, use_aq: bool = False,
                  group_of_step=None, kv_cache_fn=None) -> Callable:
    """Returns ``model_fn(x, t, step) -> eps`` for the scan samplers.

    ``group_of_step``: optional int array mapping sampler step index ->
    FSC group (identity when None — the DDIM convention ``act_{cnt}``,
    denoising.py:26-29; LDM uses a t-derived map, ddpm.py:1403-1405).

    ``kv_cache_fn``: optional ``(qctx) -> cache`` building the
    static-context cross-attn K/V cache (ldm_unet.build_cross_kv). It is
    called ONCE here with a group-0 ctx — the context-fed to_k/to_v
    sites are timestep-static (their input doesn't depend on t), so one
    FSC group's params represent all of them — and the cache rides the
    model_fn closure, hoisting those projections out of the sampler scan.
    """
    if group_of_step is not None:
        group_of_step = jnp.asarray(group_of_step, jnp.int32)

    kv_cache = None
    if kv_cache_fn is not None:
        astate0 = slice_fsc(astate_batched, 0) \
            if (use_aq and astate_batched) else {}
        ctx0 = QuantCtx(adapter.policy, wstate=wstate or {},
                        astate=astate0, use_wq=use_wq, use_aq=use_aq,
                        flash=True)
        kv_cache = kv_cache_fn(ctx0)

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
        ctx = QuantCtx(adapter.policy, wstate=wstate or {}, astate=astate,
                       use_wq=use_wq, use_aq=use_aq, flash=True)
        if kv_cache is not None:
            return adapter.forward(params, ctx, x, t, *cond,
                                   kv_cache=kv_cache)
        return adapter.forward(params, ctx, x, t, *cond)

    return model_fn
