"""Data-parallel reconstruction over a device mesh.

Re-specifies the reference's multi-GPU calibration (cali_model_multi,
calibration.py:228-389): every device holds the replicated model and 1/N
of the calibration samples; each Adam iteration samples a local minibatch
and all-reduces gradients. TPU-native: one `shard_map` program per unit —
the per-iteration ``link.allreduce(param.grad)`` (reconstruction.py:72-75)
becomes a `lax.pmean` inside the jitted scan, riding ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..quant.adapter import ModelAdapter, UnitSpec
from ..quant.adaround import init_alpha, linear_temp_decay, round_regularizer
from ..quant.recon import ReconHP, _merge_alpha, _rec_loss, capture_unit_io


def _recon_run_dp(mesh: Mesh, unit_fwd, kind: str, role_cfgs: tuple,
                  extra: tuple, hp: ReconHP, uparams, wstate_fixed,
                  alphas, inputs, outputs, key):
    """Sharded variant of recon._recon_run: inputs/outputs sharded over
    "dp" on the sample axis; alphas replicated; per-device minibatch +
    pmean(grads) each step."""
    ndev = mesh.shape["dp"]
    n_local = jax.tree.leaves(inputs)[0].shape[0] // ndev
    bs_local = max(1, min(hp.batch_size, n_local * ndev) // ndev)
    loss_start = hp.warmup * hp.iters
    opt = optax.adam(hp.lr_alpha)

    def loss_fn(a, binp, bout, count):
        wstate = _merge_alpha(wstate_fixed, a)
        pred = unit_fwd(kind, role_cfgs, extra, uparams, wstate, {},
                        binp, True, hp.use_aq)
        rec = _rec_loss(pred, bout, hp.p)
        b = linear_temp_decay(count, hp.iters, hp.warmup, hp.b_start,
                              hp.b_end)
        reg = functools.reduce(
            jnp.add, [round_regularizer(v, b) for v in a.values()])
        return rec + jnp.where(count < loss_start, 0.0, hp.w * reg), rec

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp"), P()),
        out_specs=(P(), P()),
        check_vma=False)
    def run(alphas, uparams_, inputs_l, outputs_l, key):
        # per-device key (the reference seeds per-rank sampling implicitly
        # via independent torch RNG per process)
        dev = jax.lax.axis_index("dp")
        key = jax.random.fold_in(key, dev)
        opt_state = opt.init(alphas)

        def step(carry, i):
            a, ost, k = carry
            k, k1 = jax.random.split(k)
            idx = jax.random.permutation(k1, n_local)[:bs_local]
            binp = jax.tree.map(lambda x: x[idx], inputs_l)
            bout = jax.tree.map(lambda x: x[idx], outputs_l)
            (_, rec), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                a, binp, bout, i + 1.0)
            grads = jax.lax.pmean(grads, "dp")
            rec = jax.lax.pmean(rec, "dp")
            updates, ost = opt.update(grads, ost)
            a = optax.apply_updates(a, updates)
            return (a, ost, k), rec

        (a, _, _), losses = jax.lax.scan(
            step, (alphas, opt_state, key),
            jnp.arange(hp.iters, dtype=jnp.float32))
        return a, losses

    return jax.jit(run)(alphas, uparams, inputs, outputs, key)


def reconstruct_unit_dp(mesh: Mesh, adapter: ModelAdapter, unit: UnitSpec,
                        params, wstate, inputs, outputs, hp: ReconHP,
                        key):
    """DP version of recon.reconstruct_unit."""
    train_roles = adapter.default_train_roles(unit)
    if not train_roles:
        return wstate, None
    role_cfgs = adapter.role_cfgs(unit, train_roles)
    uparams = adapter.extract_uparams(params, unit)
    wstate_roles, alphas = {}, {}
    for role, full in unit.layers:
        st = wstate.get(full)
        if st is None:
            continue
        wstate_roles[role] = st
        if role in train_roles:
            alphas[role] = st.get("alpha")
            if alphas[role] is None:
                alphas[role] = init_alpha(params[full]["w"], st["delta"])
    fixed = {r: {k: v for k, v in st.items()
                 if not (r in alphas and k == "alpha")}
             for r, st in wstate_roles.items()}

    # pad samples to a multiple of dp
    ndev = mesh.shape["dp"]
    n = jax.tree.leaves(inputs)[0].shape[0]
    pad = (-n) % ndev
    if pad:
        rep = lambda a: jnp.concatenate([a, a[:pad]])
        inputs = jax.tree.map(rep, inputs)
        outputs = jax.tree.map(rep, outputs)
    dp_shard = NamedSharding(mesh, P("dp"))
    inputs = jax.tree.map(lambda a: jax.device_put(a, dp_shard), inputs)
    outputs = jax.tree.map(lambda a: jax.device_put(a, dp_shard), outputs)

    alphas, losses = _recon_run_dp(
        mesh, adapter.unit_fwd, unit.kind, role_cfgs, unit.extra, hp,
        uparams, fixed, alphas, inputs, outputs, key)
    new_wstate = dict(wstate)
    for role, full in unit.layers:
        if role in alphas:
            new_wstate[full] = dict(new_wstate[full])
            new_wstate[full]["alpha"] = alphas[role]
    return new_wstate, losses


def reconstruct_dp(mesh: Mesh, adapter: ModelAdapter, params, cali_data,
                   wstate, hp: ReconHP, key, *,
                   capture_batch_size: int = 128, log=None):
    """Mesh-sharded sequential reconstruction (DP analogue of
    recon.reconstruct). Capture runs replicated; the 20k-iter loops run
    sharded."""
    for unit in adapter.units:
        train = adapter.default_train_roles(unit)
        if not unit.recon or not train:
            continue
        inputs, outputs = capture_unit_io(
            adapter, unit, params, cali_data, wstate,
            asym=hp.asym, use_aq=hp.use_aq,
            batch_size=capture_batch_size)
        key, k = jax.random.split(key)
        wstate, losses = reconstruct_unit_dp(mesh, adapter, unit, params,
                                             wstate, inputs, outputs, hp,
                                             k)
        if log is not None and losses is not None:
            log(unit.name, losses)
    return wstate
