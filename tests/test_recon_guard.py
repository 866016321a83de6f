"""Do-no-harm reconstruction guard (quant/recon.py reconstruct_unit):
the HARD-rounding loss of the kept alphas must never exceed the
nearest-rounding baseline — round-3 w8a8 gate logs showed AdaRound
optimization regressing every unit, and the reference keeps the final
alphas unconditionally (reconstruction.py:63-78)."""

import jax
import jax.numpy as jnp
import numpy as np

from tfmq_dm_tpu.models import ddim_unet, ddim_units
from tfmq_dm_tpu.quant import recon
from tfmq_dm_tpu.quant.recon import ReconHP, init_weight_qparams

CFG = ddim_unet.tiny_config()


def _setup():
    params = ddim_unet.init_params(jax.random.PRNGKey(0), CFG)
    adapter = ddim_units.build_adapter(CFG, w_bits=8, a_bits=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 16, 3))
    t = jnp.tile(jnp.arange(4, dtype=jnp.int32) * 20, 4)
    return params, adapter, (x, t)


def _hard_loss_of(adapter, unit, params, wstate, inputs, outputs, hp):
    prep = recon._prep_unit_states(adapter, unit, params, wstate)
    role_cfgs, uparams, fixed, alphas = prep
    roles = recon._merge_alpha(
        fixed, {r: wstate[full]["alpha"]
                for r, full in unit.layers
                if r in alphas and "alpha" in wstate.get(full, {})})
    return recon._hard_eval(adapter.unit_fwd, unit.kind, role_cfgs,
                            unit.extra, hp, uparams, roles, inputs,
                            outputs)


def test_guard_never_worse_than_nearest():
    """Even under a pathological optimizer setting (huge lr wrecks the
    alphas), the kept state's hard loss equals the nearest baseline."""
    params, adapter, cali = _setup()
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    unit = adapter.unit_by_name("mid.block_1")
    inputs, outputs = recon.capture_unit_io(adapter, unit, params, cali,
                                            wstate, asym=True)
    hp = ReconHP(iters=30, batch_size=8, lr_alpha=25.0)  # sabotage
    stats = {}
    new_wstate, losses = recon.reconstruct_unit(
        adapter, unit, params, wstate, inputs, outputs, hp,
        jax.random.PRNGKey(3), stats=stats)
    rec = stats[unit.name]
    assert rec["hard_trained"] > rec["hard_nearest"]  # sabotage worked
    assert rec["kept"] == "nearest"
    # alphas still written back (schema unchanged), but they realize
    # nearest rounding: kept hard loss == the nearest baseline
    assert "alpha" in new_wstate["mid.block_1.conv1"]
    kept = _hard_loss_of(adapter, unit, params, new_wstate, inputs,
                         outputs, hp)
    # the revert stores exactly the baseline alphas the guard measured
    np.testing.assert_allclose(kept, rec["hard_nearest"], rtol=1e-6)
    assert kept < rec["hard_trained"]


def test_guard_keeps_genuine_improvement():
    params, adapter, cali = _setup()
    # w4: coarse grid, real headroom for AdaRound to improve on nearest
    adapter = ddim_units.build_adapter(CFG, w_bits=4, a_bits=8)
    wstate = init_weight_qparams(adapter.policy, params, scaler="mse")
    unit = adapter.unit_by_name("mid.block_1")
    inputs, outputs = recon.capture_unit_io(adapter, unit, params, cali,
                                            wstate, asym=True)
    hp = ReconHP(iters=300, batch_size=16, warmup=0.2)
    stats = {}
    new_wstate, _ = recon.reconstruct_unit(
        adapter, unit, params, wstate, inputs, outputs, hp,
        jax.random.PRNGKey(3), stats=stats)
    rec = stats[unit.name]
    assert rec["kept"] == "trained", rec
    assert rec["hard_trained"] < rec["hard_nearest"]


def test_act_guard_reverts_on_regression():
    """Sabotaged act-phase lr must leave the calibrated deltas intact
    (the guard keeps the originals when optimization regresses)."""
    from tfmq_dm_tpu.quant.context import QuantCtx
    params, adapter, cali = _setup()
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    ctx = QuantCtx(adapter.policy, wstate=wstate, use_wq=True,
                   use_aq=True, act_mode="init")
    adapter.forward(params, ctx, *(x[:8] for x in cali))
    astate = dict(ctx.out_astate)
    unit = adapter.unit_by_name("mid.block_1")
    inputs, outputs = recon.capture_unit_io(
        adapter, unit, params, cali, wstate, astate, asym=True,
        use_aq=True)
    hp = ReconHP(iters=20, batch_size=8, lr_delta=50.0)  # sabotage
    new_astate, _ = recon.reconstruct_unit_act(
        adapter, unit, params, wstate, astate, inputs, outputs, hp,
        jax.random.PRNGKey(5))
    for site, st in new_astate.items():
        np.testing.assert_array_equal(np.asarray(st["delta"]),
                                      np.asarray(astate[site]["delta"]))


def test_loss_floor_skips_optimization():
    params, adapter, cali = _setup()
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    unit = adapter.unit_by_name("mid.block_1")
    inputs, outputs = recon.capture_unit_io(adapter, unit, params, cali,
                                            wstate, asym=True)
    hp = ReconHP(iters=30, batch_size=8, loss_floor=1e9)
    stats = {}
    new_wstate, losses = recon.reconstruct_unit(
        adapter, unit, params, wstate, inputs, outputs, hp,
        jax.random.PRNGKey(3), stats=stats)
    assert losses is None
    assert stats[unit.name]["skipped"]
    assert new_wstate is wstate  # untouched
