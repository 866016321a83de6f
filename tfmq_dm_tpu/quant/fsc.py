"""FSC — Finite Set Calibration of activation quantizers per timestep.

Re-specifies the act-calibration loop of ``cali_model``
(/root/reference/quant/calibration.py:108-152): for each timestep group,
re-initialize every activation quantizer from a small random subset (lazy
init in forward order under the quantized prefix), then optionally run a
running-stat EMA pass over the whole group, and store the resulting
(delta, zero_point).

TPU-first: results are **batched arrays** ``{site: {delta: (G, ...), zp:
(G, ...)}}`` indexed inside the jitted sampler with a dynamic step index —
no per-step ``load_state_dict`` host round-trip (cf. denoising.py:26-29,
ddpm.py:1403-1405). The init forward and the EMA scan are each compiled
once and reused for all G groups.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .adapter import ModelAdapter
from .context import QuantCtx


@functools.partial(jax.jit, static_argnames=("adapter", "act_scaler"))
def _fsc_init(adapter: ModelAdapter, act_scaler: str, params, wstate,
              batch):
    ctx = QuantCtx(adapter.policy, wstate=wstate, use_wq=True, use_aq=True,
                   act_mode="init", act_scaler=act_scaler)
    adapter.forward(params, ctx, *batch)
    return ctx.out_astate, ctx.out_arange


@functools.partial(jax.jit,
                   static_argnames=("adapter", "momentum", "batch_size"))
def _fsc_ema(adapter: ModelAdapter, momentum: float, batch_size: int,
             params, wstate, arange0, group_data, perm):
    n = jax.tree.leaves(group_data)[0].shape[0]
    nb = n // batch_size

    def step(arange, i):
        idx = jax.lax.dynamic_slice_in_dim(perm, i * batch_size, batch_size)
        b = jax.tree.map(lambda a: a[idx], group_data)
        ctx = QuantCtx(adapter.policy, wstate=wstate, use_wq=True,
                       use_aq=True, act_mode="ema", arange=arange,
                       ema_momentum=momentum)
        adapter.forward(params, ctx, *b)
        out_astate = ctx.out_astate
        return ctx.out_arange, out_astate

    arange, astates = jax.lax.scan(step, arange0, jnp.arange(nb))
    # the stored params are those after the LAST ema update
    astate = jax.tree.map(lambda a: a[-1], astates)
    return astate, arange


def fsc_calibrate(adapter: ModelAdapter, params, wstate,
                  a_cali_data: Tuple[jax.Array, ...], key, *,
                  running_stat: bool = True, init_samples: int = 16,
                  batch_size: int = 16, momentum: float = 0.95,
                  act_scaler: str = "mse") -> Dict:
    """a_cali_data: tuple of group-major arrays, leading dims (G, N, ...)
    — e.g. the direct output of ``harvest_trajectory`` (steps = groups).
    Returns the batched FSC state {site: {"delta": (G, ...), "zp": ...}}.
    """
    groups = a_cali_data[0].shape[0]
    n = a_cali_data[0].shape[1]
    per_group = []
    for g in range(groups):
        gdata = tuple(x[g] for x in a_cali_data)
        key, k1, k2 = jax.random.split(key, 3)
        inds = jax.random.choice(k1, n, (min(init_samples, n),),
                                 replace=False)
        init_batch = tuple(x[inds] for x in gdata)
        astate, arange = _fsc_init(adapter, act_scaler, params, wstate,
                                   init_batch)
        if running_stat and n >= batch_size:
            perm = jax.random.permutation(k2, n)
            astate, arange = _fsc_ema(adapter, momentum, batch_size,
                                      params, wstate, arange, gdata, perm)
        per_group.append(astate)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_group)


def slice_fsc(astate_batched: Dict, group_index) -> Dict:
    """Dynamic per-step slice of the batched FSC state — the jit-friendly
    replacement for the reference's per-step load_state_dict swap."""
    return jax.tree.map(lambda a: a[group_index], astate_batched)


def pack_fsc(astate_batched: Dict):
    """Flatten the batched FSC state {site: {delta: (G, ...), zp: (G,
    ...)}} into one (G, L) float32 matrix plus a static unpack spec.

    Slicing hundreds of per-site scalars with separate dynamic gathers
    every sampler step shows up as fixed per-op overhead at small batch
    (docs/PERF.md batch-1 analysis); packing reduces the per-step FSC
    swap to ONE dynamic row slice + static (free) carves. All leaves are
    small quantizer params (|zp| < 2**bits), exactly representable in
    float32, so the round-trip is bit-exact — asserted by
    tests/test_fsc_pack.py against slice_fsc."""
    leaves, treedef = jax.tree_util.tree_flatten(astate_batched)
    shapes = tuple(l.shape[1:] for l in leaves)
    dtypes = tuple(l.dtype for l in leaves)
    sizes = tuple(int(np.prod(s, dtype=np.int64)) for s in shapes)
    g = leaves[0].shape[0]
    flat = jnp.concatenate(
        [l.reshape(g, -1).astype(jnp.float32) for l in leaves], axis=1)
    return flat, (treedef, shapes, sizes, dtypes)


def unpack_fsc(row: jax.Array, spec) -> Dict:
    """Inverse of one packed row: static slices/reshapes/casts only."""
    treedef, shapes, sizes, dtypes = spec
    out, off = [], 0
    for sh, sz, dt in zip(shapes, sizes, dtypes):
        out.append(row[off:off + sz].reshape(sh).astype(dt))
        off += sz
    return jax.tree_util.tree_unflatten(treedef, out)
