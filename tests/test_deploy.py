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


def test_int4_packed_linear_weight_only():
    """Int4Weight pack/unpack == the unpacked dequant, and the qlinear
    CPU fallback == fake-quant linear (weight-only w4)."""
    import numpy as np

    from tfmq_dm_tpu.ops import int_ops
    from tfmq_dm_tpu.quant.deploy import _pack_linear_int4, dequant_int4
    from tfmq_dm_tpu.quant.quantizer import QCfg, init_qparams

    cfg = QCfg(bits=4, channel_wise=True)
    k, n = 64, 320   # n not a multiple of the pack tile -> padding path
    w = jax.random.normal(jax.random.PRNGKey(7), (k, n))
    delta, zp = init_qparams(w, cfg, scaler="minmax")
    iw = int_ops.quantize_weight_int(w, delta, zp, cfg)
    iw4 = _pack_linear_int4(iw)
    assert iw4.n == n and iw4.w_packed.shape == (k, iw4.delta.shape[0] // 2)
    np.testing.assert_allclose(
        np.asarray(dequant_int4(iw4)),
        np.asarray(int_ops.dequant_weight(iw)), atol=1e-6, rtol=1e-6)


def test_specialize_maps_exact(setup):
    """Border maps precomputed at deploy time (specialize_maps) produce
    the bit-identical conv outputs as the in-graph fallback, for both
    asymmetric (v_map) and the w_map-only path, with the deployment dict
    crossing the jit boundary as an argument."""
    from tfmq_dm_tpu.quant.deploy import specialize_maps

    params, adapter, wstate, astate = setup
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 16, 16, 3))
    t = jnp.full((2,), 7, jnp.int32)
    dep = deploy_weights(adapter.policy, params, wstate)
    dep_m = specialize_maps(adapter, params, dep,
                            example_args=(x[:1], t[:1]), use_aq=True)
    # maps attached to act-quantized convs only, with output shapes
    has_maps = [n for n, iw in dep_m.items()
                if getattr(iw, "w_map", None) is not None]
    assert has_maps, "no maps were attached"
    for n in has_maps:
        assert dep_m[n].w_map.shape[0] == 1
        assert not dep_m[n].sym or dep_m[n].v_map is None

    def run(d, xx, tt):
        fn = make_deployed_model_fn(adapter, params, d, astate,
                                    use_aq=True)
        return fn(xx, tt, 0)

    a = jax.jit(run)(dep, x, t)
    b = jax.jit(run)(dep_m, x, t)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_deployed_matches_fake_quant_wide_bits_w16a16():
    """>8-bit grids can't ride the int8 paths (codes wrap in the int8
    cast); deployment must fall back to offline fake-quant weights +
    elementwise act fake-quant and stay bit-consistent with the sim."""
    params = ddim_unet.init_params(jax.random.PRNGKey(20), CFG)
    adapter = ddim_units.build_adapter(CFG, w_bits=16, a_bits=16)
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    fp_fn = lambda x, t, s: ddim_unet.apply(params, CFG, x, t)
    xs, ts = harvest_trajectory(fp_fn, BETAS, SEQ,
                                jax.random.normal(jax.random.PRNGKey(21),
                                                  (4, 16, 16, 3)),
                                jax.random.PRNGKey(22))
    astate = fsc_calibrate(adapter, params, wstate, (xs, ts),
                           jax.random.PRNGKey(23), running_stat=False,
                           init_samples=4)
    x = jax.random.normal(jax.random.PRNGKey(24), (2, 16, 16, 3))
    t = jnp.array([50, 7], jnp.int32)
    sim = make_model_fn(adapter, params, wstate, astate, use_wq=True,
                        use_aq=True)(x, t, 0)
    deployed = deploy_weights(adapter.policy, params, wstate)
    got = make_deployed_model_fn(adapter, params, deployed, astate,
                                 use_aq=True)(x, t, 0)
    got, sim = np.asarray(got), np.asarray(sim)
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, sim, atol=2e-4, rtol=1e-4)


def test_int4_serving_deployment(setup):
    """deploy_weights(int4_serving=True) packs 4-bit conv weights and
    aq'd linears; the deployed forward stays close to the fake-quant
    sim (bf16 weight-dequant rounding is the only difference; on CPU
    the conv takes the dequant_int4_conv fallback — the Pallas tap-GEMM
    kernel is exactness-tested in test_pallas_kernels)."""
    params, adapter, wstate, astate = setup
    from tfmq_dm_tpu.quant.context import QuantCtx
    from tfmq_dm_tpu.quant.fsc import slice_fsc

    # rebuild 4-bit weight state on the same adapter topology
    adapter4 = ddim_units.build_adapter(CFG, w_bits=4, a_bits=8)
    wstate4 = init_weight_qparams(adapter4.policy, params,
                                  scaler="minmax")
    deployed = deploy_weights(adapter4.policy, params, wstate4,
                              int4_serving=True)
    kinds = {type(v).__name__ for v in deployed.values()}
    assert "Int4ConvWeight" in kinds
    ast = slice_fsc(astate, 0)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)

    sim_ctx = QuantCtx(adapter4.policy, wstate=wstate4, astate=ast,
                       use_wq=True, use_aq=True)
    sim = ddim_unet.apply(params, CFG, x, t, sim_ctx)
    dep_ctx = QuantCtx(adapter4.policy, astate=ast, use_wq=True,
                       use_aq=True, deploy=deployed)
    dep = ddim_unet.apply(params, CFG, x, t, dep_ctx)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(sim),
                               atol=0.05, rtol=0.05)
