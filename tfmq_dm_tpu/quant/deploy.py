"""Deployment: convert a calibration artifact into integer weights and an
integer-executing model function.

This is the capability the reference lacks in-repo: it acknowledges that
real speed needs integer kernels and defers to OpenVINO (README.md:132).
Here the calibrated model runs int8 on the MXU, bit-exact with the
fake-quant semantics (see ops/int_ops.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import int_ops
from .adapter import ModelAdapter
from .context import QuantCtx
from .fsc import slice_fsc
from .policy import QuantPolicy


def deploy_weights(policy: QuantPolicy, params, wstate: Dict
                   ) -> Dict[str, int_ops.IntWeight]:
    """Offline: quantize every wq-enabled layer's weights to centered
    integers using the calibrated (delta, zp[, alpha])."""
    deployed = {}
    for name in policy.weight_layers():
        pol = policy.get(name)
        st = wstate.get(name)
        if not pol.wq or st is None:
            continue
        deployed[name] = int_ops.quantize_weight_int(
            params[name]["w"], st["delta"], st["zp"], pol.w_cfg,
            alpha=st.get("alpha"))
    return deployed


def make_deployed_model_fn(adapter: ModelAdapter, params,
                           deployed: Dict[str, int_ops.IntWeight],
                           astate_batched: Optional[Dict] = None, *,
                           use_aq: bool = False, group_of_step=None,
                           act_dtype=jnp.float32) -> Callable:
    """model_fn(x, t, step) that executes int8 convs/matmuls. FSC act
    params are sliced per step like the fake-quant path."""
    if group_of_step is not None:
        group_of_step = jnp.asarray(group_of_step, jnp.int32)

    def model_fn(x, t, step, *cond):
        astate = {}
        if use_aq and astate_batched is not None:
            g = step if group_of_step is None else group_of_step[step]
            astate = slice_fsc(astate_batched, g)
        ctx = QuantCtx(adapter.policy, wstate={}, astate=astate,
                       use_wq=True, use_aq=use_aq, deploy=deployed,
                       act_out_dtype=act_dtype, flash=True)
        return adapter.forward(params, ctx, x, t, *cond)

    return model_fn
