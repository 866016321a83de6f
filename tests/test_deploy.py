"""Deployed int8 model vs fake-quant simulation: full UNet forward and a
whole DDIM rollout must agree to fp32 tolerance (the int path is the same
math executed on integer operands)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmq_dm_tpu.models import ddim_unet, ddim_units
from tfmq_dm_tpu.quant.deploy import deploy_weights, make_deployed_model_fn
from tfmq_dm_tpu.quant.fsc import fsc_calibrate
from tfmq_dm_tpu.quant.inference import make_model_fn
from tfmq_dm_tpu.quant.recon import init_weight_qparams
from tfmq_dm_tpu.samplers.ddim import generalized_scan, harvest_trajectory
from tfmq_dm_tpu.utils.schedules import get_beta_schedule, skip_seq

CFG = ddim_unet.tiny_config()
BETAS = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                          num_diffusion_timesteps=100)
SEQ = skip_seq("uniform", 100, 4)


@pytest.fixture(scope="module")
def setup():
    params = ddim_unet.init_params(jax.random.PRNGKey(0), CFG)
    adapter = ddim_units.build_adapter(CFG, w_bits=8, a_bits=8)
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    fp_fn = lambda x, t, s: ddim_unet.apply(params, CFG, x, t)
    xs, ts = harvest_trajectory(fp_fn, BETAS, SEQ,
                                jax.random.normal(jax.random.PRNGKey(1),
                                                  (8, 16, 16, 3)),
                                jax.random.PRNGKey(2))
    astate = fsc_calibrate(adapter, params, wstate, (xs, ts),
                           jax.random.PRNGKey(3), running_stat=False,
                           init_samples=8)
    return params, adapter, wstate, astate


def test_deployed_forward_matches_fake_quant_weight_only(setup):
    params, adapter, wstate, _ = setup
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 3))
    t = jnp.array([50, 7], jnp.int32)
    sim = make_model_fn(adapter, params, wstate, use_wq=True)(x, t, 0)
    deployed = deploy_weights(adapter.policy, params, wstate)
    got = make_deployed_model_fn(adapter, params, deployed)(x, t, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(sim),
                               atol=2e-4, rtol=1e-4)


def test_deployed_forward_matches_fake_quant_w8a8(setup):
    params, adapter, wstate, astate = setup
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 3))
    t = jnp.array([90, 10], jnp.int32)
    sim_fn = make_model_fn(adapter, params, wstate, astate, use_wq=True,
                           use_aq=True)
    dep_fn = make_deployed_model_fn(
        adapter, params, deploy_weights(adapter.policy, params, wstate),
        astate, use_aq=True)
    for step in (0, 3):
        sim = np.asarray(sim_fn(x, t, step))
        got = np.asarray(dep_fn(x, t, step))
        # fp reassociation (int32 accumulate + corrections vs fp conv)
        # flips act-rounding ties downstream; agreement is within ~one
        # activation quantization level, not bitwise
        err = np.abs(got - sim)
        assert err.max() < 0.06, err.max()
        assert np.mean(err) < 5e-3


def test_deployed_rollout_matches_fake_quant(setup):
    params, adapter, wstate, astate = setup
    x0 = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 16, 3))
    sim_fn = make_model_fn(adapter, params, wstate, astate, use_wq=True,
                           use_aq=True)
    dep_fn = make_deployed_model_fn(
        adapter, params, deploy_weights(adapter.policy, params, wstate),
        astate, use_aq=True)
    a = jax.jit(lambda x: generalized_scan(sim_fn, BETAS, SEQ, x))(x0)
    b = jax.jit(lambda x: generalized_scan(dep_fn, BETAS, SEQ, x))(x0)
    # errors accumulate over steps; stays within sampling tolerance
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=0.05,
                               rtol=0.05)
