"""Quantitative acceptance gate: the calibrated quantized model must
reproduce the FP model's outputs above fixed SQNR/PSNR floors under the
real pipeline (harvest -> TIAR -> FSC -> sampler rollout on identical
seeds). This is the in-repo stand-in for FID parity while no pretrained
checkpoint is reachable (utils/fid.py closes the loop to real FID once
weights exist); thresholds are deliberately loose floors that catch
regressions in the calibration/deployment numerics, not image-quality
claims."""

import json
import os
import subprocess
import sys

import pytest

ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""))


@pytest.mark.slow
@pytest.mark.parametrize("wq,sqnr_floor", [(8, 18.0), (4, 12.0)])
def test_quality_gate_tiny_ddim(wq, sqnr_floor, tmp_path):
    out = str(tmp_path / "qg.json")
    r = subprocess.run(
        [sys.executable, "scripts/quality_gate.py", "tiny_ddim",
         "--wq", str(wq), "--iters", "100", "--n-cali", "8",
         "--batch", "4", "--json", out],
        capture_output=True, text=True, env=ENV, cwd="/root/repo",
        timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(out) as f:
        res = json.load(f)
    assert res["unet_sqnr_db_mean"] >= sqnr_floor, res
    assert res["sample_psnr_db"] >= 25.0, res


@pytest.mark.parametrize("wq,sqnr_floor,psnr_floor",
                         [(8, 20.0, 30.0), (4, 8.0, 22.0)])
def test_quality_floor_micro(wq, sqnr_floor, psnr_floor):
    """FAST-TIER quality floors: the full pipeline (harvest -> TIAR ->
    FSC -> quantized rollout) on the tiny config must keep the w8a8 and
    w4a8 models above fixed SQNR/PSNR floors. Runs in the default tier
    so a plain `pytest -q` fails if calibration or quantized-inference
    numerics regress (scalers, AdaRound+guard, TIAR, FSC) — BEFORE a
    TPU campaign burns hours on a broken build; the heavier
    subprocess-driven gates above stay in the slow tier."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tfmq_dm_tpu.configs.tasks import get_task
    from tfmq_dm_tpu.models import ddim_unet
    from tfmq_dm_tpu.pipelines import ptq
    from tfmq_dm_tpu.quant.calibrate import cali_model
    from tfmq_dm_tpu.quant.context import QuantCtx
    from tfmq_dm_tpu.quant.fsc import slice_fsc
    from tfmq_dm_tpu.quant.recon import ReconHP
    from tfmq_dm_tpu.utils.metrics import psnr, sqnr_db

    task = get_task("tiny_ddim")
    cfg = task.unet
    params = ddim_unet.init_params(jax.random.PRNGKey(7), cfg)

    def fp_apply(x, t, c=None, qctx=None):
        return ddim_unet.apply(params, cfg, x, t, qctx)

    qargs = ptq.QuantArgs(wq=wq, aq=8, use_aq=True, w_sym=True,
                          iters=40, cali_save_path=None, seed=0)
    adapter = ptq.build_adapter(task, qargs)
    steps = 8
    w_cali, a_cali, _ = ptq.generate_cali_data(
        task, lambda x, t, c: fp_apply(x, t, c), jax.random.PRNGKey(1),
        n_per_t=4, steps=steps)
    hp = ReconHP(iters=40, batch_size=4)
    wstate, astate = cali_model(adapter, params, w_cali, a_cali, hp=hp,
                                use_aq=True, key=jax.random.PRNGKey(2))

    sampler_fn, _ = ptq.make_schedule(task, steps=steps)
    x0 = jax.random.normal(jax.random.PRNGKey(3),
                           (4, cfg.resolution, cfg.resolution,
                            cfg.in_channels))
    ks = jax.random.PRNGKey(4)

    def fp_model(x, t, step):
        return fp_apply(x, t)

    def q_model(x, t, step):
        qctx = QuantCtx(adapter.policy, wstate=wstate,
                        astate=slice_fsc(astate, step),
                        use_wq=True, use_aq=True, flash=True)
        return fp_apply(x, t, qctx=qctx)

    fp_last, (fp_xs, fp_ts) = jax.jit(
        lambda x, k: sampler_fn(fp_model, x, k, collect="traj"))(x0, ks)
    q_last, _ = jax.jit(
        lambda x, k: sampler_fn(q_model, x, k, collect="traj"))(x0, ks)

    # UNet-output SQNR at the FP trajectory points (n_steps derived
    # from the harvested trajectory, which may differ from `steps`)
    n_steps = int(np.asarray(fp_ts).shape[0])

    @jax.jit
    def eps_pairs(xs, ts):
        def one(_, inp):
            x, t, i = inp
            return 0, (fp_model(x, t, i), q_model(x, t, i))
        return jax.lax.scan(one, 0, (xs, ts, jnp.arange(n_steps)))[1]

    e_fp, e_q = eps_pairs(jnp.asarray(fp_xs), jnp.asarray(fp_ts))
    e_fp, e_q = np.asarray(e_fp), np.asarray(e_q)
    sqnrs = [sqnr_db(e_fp[i], e_q[i]) for i in range(n_steps)]
    fp_img = np.clip(np.asarray(fp_last) * 0.5 + 0.5, 0, 1)
    q_img = np.clip(np.asarray(q_last) * 0.5 + 0.5, 0, 1)
    assert float(np.mean(sqnrs)) >= sqnr_floor, sqnrs
    assert psnr(fp_img, q_img) >= psnr_floor, psnr(fp_img, q_img)
