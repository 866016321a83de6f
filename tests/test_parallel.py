"""Multi-device tests on the 8-way virtual CPU mesh: sharded harvest,
DP reconstruction with pmean grads, tp-sharded forward. These are the
framework's answer to the reference's NCCL path (which has no test
harness at all — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmq_dm_tpu.models import ddim_unet, ddim_units
from tfmq_dm_tpu.parallel.mesh import (make_mesh, replicate, shard_batch,
                                       shard_params_tp)
from tfmq_dm_tpu.quant import recon
from tfmq_dm_tpu.quant.inference import make_model_fn
from tfmq_dm_tpu.quant.recon import ReconHP, init_weight_qparams

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = ddim_unet.tiny_config()


@pytest.fixture(scope="module")
def setup():
    params = ddim_unet.init_params(jax.random.PRNGKey(0), CFG)
    adapter = ddim_units.build_adapter(CFG, w_bits=8, a_bits=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 16, 3))
    t = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 100)
    return params, adapter, (x, t)


def test_dp_recon_runs_and_improves(setup):
    params, adapter, cali = setup
    mesh = make_mesh(dp=8, tp=1)
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    unit = adapter.unit_by_name("mid.block_1")
    inputs, outputs = recon.capture_unit_io(adapter, unit, params, cali,
                                            wstate, asym=True)
    hp = ReconHP(iters=30, batch_size=16)
    new_wstate, losses = recon.reconstruct_unit(
        adapter, unit, params, wstate, inputs, outputs, hp,
        jax.random.PRNGKey(3), mesh=mesh)
    assert "alpha" in new_wstate["mid.block_1.conv1"]
    assert np.all(np.isfinite(np.asarray(losses)))


def test_dp_grads_match_single_device(setup):
    """One DP step with full-batch minibatch == single-device step
    (pmean of identical per-shard grads over disjoint shards equals the
    global-batch gradient when batch == N)."""
    params, adapter, cali = setup
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    unit = adapter.unit_by_name("mid.block_1")
    inputs, outputs = recon.capture_unit_io(adapter, unit, params, cali,
                                            wstate, asym=True)
    n = inputs[0].shape[0]
    # single device, batch = n (whole set)
    hp1 = ReconHP(iters=1, batch_size=n)
    w_single, _ = recon.reconstruct_unit(adapter, unit, params, wstate,
                                         inputs, outputs, hp1,
                                         jax.random.PRNGKey(9))
    # 8-way DP, local batch = n/8 — permutation of n/8 elements takes all
    mesh = make_mesh(dp=8, tp=1)
    w_dp, _ = recon.reconstruct_unit(adapter, unit, params, wstate,
                                     inputs, outputs, hp1,
                                     jax.random.PRNGKey(9), mesh=mesh)
    a1 = np.asarray(w_single["mid.block_1.conv1"]["alpha"])
    a2 = np.asarray(w_dp["mid.block_1.conv1"]["alpha"])
    # Adam's first step is sign(grad)*lr regardless of magnitude, and the
    # global gradient equals the pmean of shard gradients here
    np.testing.assert_allclose(a1, a2, atol=2e-5)


def test_tp_sharded_forward_matches_replicated(setup):
    params, adapter, _ = setup
    mesh = make_mesh(dp=4, tp=2)
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 16, 16, 3))
    t = jnp.zeros((8,), jnp.int32)

    model_fn = make_model_fn(adapter, params, wstate, use_wq=True)
    ref = model_fn(x, t, 0)

    params_tp = shard_params_tp(mesh, params)
    fn_tp = make_model_fn(adapter, params_tp, wstate, use_wq=True)
    out = jax.jit(lambda x, t: fn_tp(x, t, 0))(shard_batch(mesh, x), t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_sharded_harvest_matches_single(setup):
    from tfmq_dm_tpu.samplers.ddim import harvest_trajectory
    from tfmq_dm_tpu.utils.schedules import get_beta_schedule, skip_seq
    params, adapter, _ = setup
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=100)
    seq = skip_seq("uniform", 100, 3)
    fp_fn = lambda x, t, s: ddim_unet.apply(params, CFG, x, t)
    x0 = jax.random.normal(jax.random.PRNGKey(6), (8, 16, 16, 3))
    xs_ref, ts_ref = harvest_trajectory(fp_fn, betas, seq, x0,
                                        jax.random.PRNGKey(7))
    mesh = make_mesh(dp=8, tp=1)
    xs_dp, ts_dp = jax.jit(
        lambda x, k: harvest_trajectory(fp_fn, betas, seq, x, k))(
        shard_batch(mesh, x0), jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(xs_dp), np.asarray(xs_ref),
                               atol=1e-4, rtol=1e-4)


def test_sample_fid_dp_mesh(setup, tmp_path):
    """FID sampling with a dp mesh: batch sharded over 8 CPU devices,
    bundle replicated, identical results to single-device sampling
    (cli.py --dp N path)."""
    from tfmq_dm_tpu.configs.tasks import tiny_ddim
    from tfmq_dm_tpu.pipelines import sampling
    from tfmq_dm_tpu.samplers import ddim as ddim_s
    from tfmq_dm_tpu.utils.schedules import get_beta_schedule, skip_seq

    params, adapter, _ = setup
    task = tiny_ddim()
    betas = get_beta_schedule(task.beta_schedule, beta_start=task.beta_start,
                              beta_end=task.beta_end,
                              num_diffusion_timesteps=task.num_timesteps)
    seq = skip_seq("uniform", task.num_timesteps, 3)

    def sampler_fn(model, x, k):
        return ddim_s.generalized_scan(model, betas, seq, x)

    def model_fn(b, x, t, s):
        return ddim_unet.apply(b["params"], CFG, x, t)

    bundle = {"params": params}
    key = jax.random.PRNGKey(11)
    ref = sampling.sample_fid(task, sampler_fn, model_fn, n_images=16,
                              batch_size=8, key=key, bundle=bundle)
    mesh = make_mesh(dp=8, tp=1)
    got = sampling.sample_fid(task, sampler_fn, model_fn, n_images=16,
                              batch_size=8, key=key,
                              bundle=replicate(mesh, bundle), mesh=mesh)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_dp_fisher_matches_single_device(setup):
    """Fisher-loss reconstruction under the dp mesh uses the same cached
    |grad|+1 weights as the single-device driver (round-1 dp forked to
    MSE-only; the unified driver keeps hp.rloss)."""
    params, adapter, cali = setup
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    unit = adapter.unit_by_name("mid.block_1")
    inputs, outputs = recon.capture_unit_io(adapter, unit, params, cali,
                                            wstate, asym=True)
    fgrads = recon.capture_unit_grads(adapter, unit, params, cali,
                                      wstate, batch_size=8)
    n = inputs[0].shape[0]
    hp = ReconHP(iters=1, batch_size=n, rloss="fisher_diag")
    w_single, _ = recon.reconstruct_unit(adapter, unit, params, wstate,
                                         inputs, outputs, hp,
                                         jax.random.PRNGKey(9), fgrads)
    mesh = make_mesh(dp=8, tp=1)
    w_dp, _ = recon.reconstruct_unit(adapter, unit, params, wstate,
                                     inputs, outputs, hp,
                                     jax.random.PRNGKey(9), fgrads,
                                     mesh=mesh)
    a1 = np.asarray(w_single["mid.block_1.conv1"]["alpha"])
    a2 = np.asarray(w_dp["mid.block_1.conv1"]["alpha"])
    np.testing.assert_allclose(a1, a2, atol=2e-5)


@pytest.mark.slow
def test_dp_recon_resume(setup, tmp_path):
    """resume_dir works under the mesh: a second run skips completed
    units and reproduces the same alphas."""
    params, adapter, cali = setup
    mesh = make_mesh(dp=8, tp=1)
    hp = ReconHP(iters=4, batch_size=16)
    w0 = init_weight_qparams(adapter.policy, params, scaler="minmax")
    w1 = recon.reconstruct(adapter, params, cali, dict(w0), hp,
                           jax.random.PRNGKey(3), mesh=mesh,
                           resume_dir=str(tmp_path))
    w2 = recon.reconstruct(adapter, params, cali, dict(w0), hp,
                           jax.random.PRNGKey(3), mesh=mesh,
                           resume_dir=str(tmp_path))
    for name, st in w1.items():
        if "alpha" in st:
            np.testing.assert_allclose(np.asarray(st["alpha"]),
                                       np.asarray(w2[name]["alpha"]))


@pytest.mark.slow
def test_act_recon_dp_mesh(setup):
    """Act-phase reconstruction under the dp mesh (the second shard_map
    site, recon.py::_act_run): deltas move, losses finite, vma checking
    enabled."""
    params, adapter, cali = setup
    from tfmq_dm_tpu.quant.context import QuantCtx
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    ctx = QuantCtx(adapter.policy, wstate=wstate, use_wq=True,
                   use_aq=True, act_mode="init")
    x, t = cali
    adapter.forward(params, ctx, x[:8], t[:8])
    astate = dict(ctx.out_astate)
    unit = adapter.unit_by_name("mid.block_1")
    inputs, outputs = recon.capture_unit_io(adapter, unit, params, cali,
                                            wstate, astate, use_aq=True)
    mesh = make_mesh(dp=8, tp=1)
    hp = ReconHP(iters=8, batch_size=16)
    out, losses = recon.reconstruct_unit_act(
        adapter, unit, params, wstate, astate, inputs, outputs, hp,
        jax.random.PRNGKey(5), mesh=mesh)
    assert set(out) == set(astate)
    assert np.all(np.isfinite(np.asarray(losses)))
    moved = any(
        not np.array_equal(np.asarray(out[s]["delta"]),
                           np.asarray(astate[s]["delta"]))
        for s in out)
    assert moved, "no act delta was updated under the mesh"
