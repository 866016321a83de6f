"""End-to-end PTQ calibration on the tiny LDM and SD UNets: unit coverage,
unit-forward parity with the in-model blocks, reconstruction, FSC, and
quantized + deployed sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmq_dm_tpu.models import ldm_unet, ldm_units
from tfmq_dm_tpu.quant import recon
from tfmq_dm_tpu.quant.calibrate import cali_model
from tfmq_dm_tpu.quant.deploy import deploy_weights, make_deployed_model_fn
from tfmq_dm_tpu.quant.inference import make_model_fn
from tfmq_dm_tpu.quant.recon import ReconHP, init_weight_qparams
from tfmq_dm_tpu.samplers.ddim import generalized_scan, harvest_trajectory
from tfmq_dm_tpu.utils.schedules import get_beta_schedule, skip_seq

BETAS = get_beta_schedule("linear", beta_start=0.0015, beta_end=0.0195,
                          num_diffusion_timesteps=100)
SEQ = skip_seq("uniform", 100, 4)


def _mk(family):
    if family == "ldm":
        cfg = ldm_unet.tiny_ldm_config()
        ctx_dim = None
    else:
        cfg = ldm_unet.tiny_sd_config()
        ctx_dim = cfg.context_dim
    params = ldm_unet.init_params(jax.random.PRNGKey(0), cfg)
    adapter = ldm_units.build_adapter(cfg, w_bits=8, a_bits=8, use_aq=True)
    c = None
    if ctx_dim:
        c = jax.random.normal(jax.random.PRNGKey(9), (6, 5, ctx_dim))

    def fp_fn(x, t, step):
        return ldm_unet.apply(params, cfg, x, t, context=c)

    xs, ts = harvest_trajectory(
        fp_fn, BETAS, SEQ,
        jax.random.normal(jax.random.PRNGKey(1),
                          (6, cfg.image_size, cfg.image_size,
                           cfg.in_channels)),
        jax.random.PRNGKey(2))
    if c is not None:
        cs = jnp.broadcast_to(c[None], (xs.shape[0],) + c.shape)
        w_cali = (xs.reshape(-1, *xs.shape[2:]), ts.reshape(-1),
                  cs.reshape(-1, *c.shape[1:]))
        a_cali = (xs, ts, cs)
    else:
        w_cali = (xs.reshape(-1, *xs.shape[2:]), ts.reshape(-1))
        a_cali = (xs, ts)
    return cfg, params, adapter, w_cali, a_cali, c


@pytest.mark.parametrize("family", ["ldm", "sd"])
def test_units_cover_all_recon_layers(family):
    cfg, params, adapter, *_ = _mk(family)
    unit_layers = {full for u in adapter.units for _, full in u.layers}
    for name in adapter.policy.weight_layers():
        pol = adapter.policy.get(name)
        if pol.recon or pol.quant_emb:
            assert name in unit_layers, name
    assert adapter.units[0].kind == "tib_ldm"


@pytest.mark.parametrize("family", ["ldm", "sd"])
def test_unit_fwd_matches_model(family):
    """FP unit forward == captured FP output for every unit kind."""
    import dataclasses
    cfg, params, adapter, w_cali, _, c = _mk(family)
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    kinds_seen = set()
    for unit in adapter.units:
        if unit.kind in kinds_seen or unit.kind == "tib_ldm":
            continue
        if not adapter.default_train_roles(unit):
            continue  # recon-excluded (conv_in/out)
        kinds_seen.add(unit.kind)
        inp, out_fp = recon.capture_unit_io(adapter, unit, params,
                                            w_cali, wstate, asym=False,
                                            batch_size=8)
        rc = adapter.role_cfgs(unit, frozenset())
        fp_rc = tuple(dataclasses.replace(r, w_cfg=None, aq=False)
                      for r in rc)
        up = adapter.extract_uparams(params, unit)
        pred = adapter.unit_fwd(unit.kind, fp_rc, unit.extra, up, {}, {},
                                inp, False, False)
        np.testing.assert_allclose(np.asarray(pred), np.asarray(out_fp),
                                   atol=2e-4, rtol=1e-4,
                                   err_msg=f"{unit.name} ({unit.kind})")


@pytest.mark.parametrize("family", ["ldm", "sd"])
@pytest.mark.slow
def test_cali_and_deploy_end_to_end(family):
    cfg, params, adapter, w_cali, a_cali, c = _mk(family)
    hp = ReconHP(iters=8, batch_size=4)
    wstate, astate = cali_model(adapter, params, w_cali, a_cali, hp=hp,
                                use_aq=True, running_stat=False,
                                key=jax.random.PRNGKey(3),
                                capture_batch_size=12)
    assert any("alpha" in st for st in wstate.values())
    assert astate and all(v["delta"].shape[0] == a_cali[0].shape[0]
                          for v in astate.values())

    model_fn = make_model_fn(adapter, params, wstate, astate,
                             use_wq=True, use_aq=True)
    dep_fn = make_deployed_model_fn(
        adapter, params, deploy_weights(adapter.policy, params, wstate),
        astate, use_aq=True)
    x0 = jax.random.normal(jax.random.PRNGKey(4),
                           (2, cfg.image_size, cfg.image_size,
                            cfg.in_channels))
    if c is not None:
        cc = c[:2]
        sim = generalized_scan(lambda x, t, s: ldm_unet.apply(
            params, cfg, x, t, context=cc,
            qctx=None), BETAS, SEQ, x0)
        q = generalized_scan(lambda x, t, s: model_fn_ctx(
            model_fn, adapter, params, cfg, x, t, cc, s, wstate, astate),
            BETAS, SEQ, x0)
    else:
        sim = generalized_scan(model_fn, BETAS, SEQ, x0)
        q = generalized_scan(dep_fn, BETAS, SEQ, x0)
        assert bool(jnp.all(jnp.isfinite(q)))
    assert bool(jnp.all(jnp.isfinite(sim)))


def model_fn_ctx(model_fn, adapter, params, cfg, x, t, c, step, wstate,
                 astate):
    from tfmq_dm_tpu.quant.context import QuantCtx
    from tfmq_dm_tpu.quant.fsc import slice_fsc
    ctx = QuantCtx(adapter.policy, wstate=wstate,
                   astate=slice_fsc(astate, step), use_wq=True,
                   use_aq=True)
    return ldm_unet.apply(params, cfg, x, t, context=c, qctx=ctx)
