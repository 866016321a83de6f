"""PTQ pipeline: calibration-data generation + quantization per task.

Replaces the reference's per-entry-script wiring (sample_diffusion_ddim
:159-168, sample_diffusion_ldm:445-548, txt2img:381-488,
latent_imagenet_diffusion:202-289) and quant/data_generate.py with one
task-parameterized flow. Calibration data is harvested in O(T) scans
(SURVEY.md §7) instead of the reference's O(T^2) per-timestep
re-sampling, sharded over the device mesh when one is given.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.tasks import TaskConfig, task_betas
from ..models import ddim_unet, ddim_units, ldm_unet, ldm_units
from ..quant.calibrate import cali_model
from ..quant.recon import ReconHP
from ..samplers import ddim as ddim_s
from ..samplers import ldm as ldm_s
from ..utils.schedules import skip_seq

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class QuantArgs:
    """The reference CLI quantization knobs (sample_diffusion_ddim.py:
    13-107 et al.)."""

    wq: int = 4
    aq: int = 8
    softmax_a_bit: int = 8
    use_aq: bool = False
    w_sym: bool = False                   # symmetric weight grids: the
    # deployed int kernels skip the activation-sum zero-point term
    running_stat: bool = True
    cali_n: Optional[int] = None          # samples per timestep
    iters: int = 20000
    cali_save_path: str = "cali.npz"
    seed: int = 1234


def build_adapter(task: TaskConfig, qargs: QuantArgs):
    if task.family == "ddim":
        return ddim_units.build_adapter(task.unet, w_bits=qargs.wq,
                                        a_bits=qargs.aq,
                                        softmax_a_bit=qargs.softmax_a_bit,
                                        w_sym=qargs.w_sym)
    return ldm_units.build_adapter(task.unet, w_bits=qargs.wq,
                                   a_bits=qargs.aq,
                                   softmax_a_bit=qargs.softmax_a_bit,
                                   use_aq=qargs.use_aq,
                                   w_sym=qargs.w_sym)


def make_schedule(task: TaskConfig, steps: Optional[int] = None,
                  eta: Optional[float] = None,
                  dpm_cfg: Optional[dict] = None):
    """(sampler_fn, cali_t): sampler_fn(model_fn, x, key, collect).

    ``dpm_cfg`` (only with ``task.sampler == 'dpm'``) selects a
    non-default DPM-Solver configuration via the general engine
    (samplers/dpm.py): keys order/method/skip_type/algorithm_type/
    solver_type/denoise_to_zero, reference surface
    dpm_solver.py:965-1113. The default (multistep order-2 dpmsolver++
    time_uniform — the TFMQ entry config, sampler.py:82-83) keeps the
    dedicated scan implementation.
    """
    betas = task_betas(task)
    steps = steps or task.steps
    eta = task.eta if eta is None else eta
    if task.family == "ddim":
        seq = skip_seq(task.skip_type, task.num_timesteps, steps)
        cali_t = seq[::-1].copy()

        if task.sampler == "ddpm_noisy":
            def fn(model_fn, x, key, collect="none"):
                return ddim_s.ddpm_scan(model_fn, betas, seq, x, key,
                                        collect=collect)
        else:
            def fn(model_fn, x, key, collect="none"):
                return ddim_s.generalized_scan(model_fn, betas, seq, x,
                                               key, eta=eta,
                                               collect=collect)
        return fn, cali_t

    ac = np.cumprod(1.0 - betas)
    if task.sampler == "dpm":
        if dpm_cfg:
            from ..samplers import dpm as dpm_g
            ns = dpm_g.NoiseSchedule("discrete", alphas_cumprod=ac)
            kw = dict(steps=steps, order=dpm_cfg.get("order", 2),
                      method=dpm_cfg.get("method", "multistep"),
                      skip_type=dpm_cfg.get("skip_type",
                                            "time_uniform"),
                      algorithm_type=dpm_cfg.get("algorithm_type",
                                                 "dpmsolver++"),
                      solver_type=dpm_cfg.get("solver_type",
                                              "dpm_solver"),
                      denoise_to_zero=dpm_cfg.get("denoise_to_zero",
                                                  False))
            if kw["method"] == "adaptive":
                cali_t = None  # data-dependent times: no FSC axis
            else:
                cali_t = dpm_g.eval_times(
                    ns, steps=steps, order=kw["order"],
                    method=kw["method"], skip_type=kw["skip_type"])

            def fn(model_fn, x, key, collect="none"):
                return dpm_g.dpm_solver_sample(model_fn, ns, x,
                                               collect=collect, **kw)
            return fn, cali_t

        sched = ldm_s.DPMSchedule(ac, steps)
        cali_t = sched.model_t[:-1].copy()

        def fn(model_fn, x, key, collect="none"):
            return ldm_s.dpm_solver_pp_2m_scan(model_fn, sched, x,
                                               collect=collect)
        return fn, cali_t

    ts = ldm_s.make_ddim_timesteps(steps, task.num_timesteps)
    sched = ldm_s.DDIMScheduleLDM(ac, ts, eta=eta)
    cali_t = sched.t.copy()
    if task.sampler == "plms":
        def fn(model_fn, x, key, collect="none"):
            return ldm_s.plms_scan(model_fn, sched, x, collect=collect)
    else:
        def fn(model_fn, x, key, collect="none"):
            return ldm_s.ddim_scan_ldm(model_fn, sched, x, key,
                                       collect=collect)
    return fn, cali_t


def generate_cali_data(task: TaskConfig, fp_apply: Callable,
                       key: jax.Array, *, n_per_t: int,
                       context: Optional[jax.Array] = None,
                       uncond: Optional[jax.Array] = None,
                       cfg_scale: Optional[float] = None,
                       steps: Optional[int] = None,
                       rollout_batch: Optional[int] = None,
                       dpm_cfg: Optional[dict] = None):
    """Harvest (x_t, t[, c]) at every sampler step in O(T) rollouts
    (vs data_generate.py's per-t re-sampling).

    ``fp_apply(x, t, c) -> eps`` is the FP UNet. With conditioning, each
    rollout uses CFG and the cali set holds both (x,t,uc) and (x,t,c)
    rows per latent, matching generate_cali_text_guided_data
    (data_generate.py:13-49).

    Returns (w_cali sample-major tuple, a_cali group-major tuple,
    cali_t)."""
    if dpm_cfg and dpm_cfg.get("method") == "adaptive":
        raise ValueError("adaptive DPM-Solver has data-dependent eval "
                         "times: calibration needs a fixed-step method")
    sampler_fn, cali_t = make_schedule(task, steps=steps,
                                       dpm_cfg=dpm_cfg)
    shape = (task.unet.resolution if task.family == "ddim"
             else task.unet.image_size)
    cin = task.unet.in_channels
    rollout_batch = rollout_batch or n_per_t

    xs_all, ts_all = [], []
    done = 0
    i = 0
    while done < n_per_t:
        b = min(rollout_batch, n_per_t - done)
        key, k1, k2 = jax.random.split(key, 3)
        x0 = jax.random.normal(k1, (b, shape, shape, cin))
        if context is not None:
            cc, uc = context[done:done + b], uncond[done:done + b]
            model_fn = ldm_s.make_cfg_model_fn(
                lambda x, t, c, s: fp_apply(x, t, c),
                cc, uc, cfg_scale if cfg_scale is not None
                else task.cfg_scale)
        else:
            model_fn = lambda x, t, s: fp_apply(x, t, None)
        _, (xs, ts) = sampler_fn(model_fn, x0, k2, collect="traj")
        xs_all.append(xs)
        ts_all.append(ts)
        done += b
        i += 1
    xs = jnp.concatenate(xs_all, axis=1)   # (G, N, H, W, C)
    ts = jnp.concatenate(ts_all, axis=1)

    if context is not None:
        # double each group with [uncond; cond] rows
        xs = jnp.concatenate([xs, xs], axis=1)
        ts = jnp.concatenate([ts, ts], axis=1)
        cs = jnp.concatenate([uncond[:n_per_t], context[:n_per_t]])
        cs = jnp.broadcast_to(cs[None], (xs.shape[0],) + cs.shape)
        a_cali = (xs, ts, cs)
    else:
        a_cali = (xs, ts)

    il = task.interval_length
    w_groups = tuple(x[::il] for x in a_cali)
    w_cali = tuple(x.reshape((-1,) + x.shape[2:]) for x in w_groups)
    return w_cali, a_cali, cali_t


def quantize_task(task: TaskConfig, adapter, params, qargs: QuantArgs,
                  w_cali, a_cali, *, cali_t=None, key=None,
                  capture_batch_size: int = 64, mesh=None,
                  resume_dir=None):
    """Run the full TFMQ calibration with the task's recon
    hyperparameters; saves + returns (wstate, astate). ``cali_t`` (the
    per-group timesteps) is stored in the artifact meta so inference can
    map sampler steps to FSC groups at any step count. ``mesh``:
    data-parallel reconstruction over the mesh (the reference's
    --multi_gpu calibration, sample_diffusion_ldm.py:512-524)."""
    hp = ReconHP(iters=qargs.iters, batch_size=task.recon_batch,
                 w=0.01, warmup=0.2, asym=True)
    meta = {"task": task.name, "wq": qargs.wq, "aq": qargs.aq,
            "softmax_a_bit": qargs.softmax_a_bit,
            "use_aq": qargs.use_aq, "steps": int(a_cali[0].shape[0])}
    if cali_t is not None:
        meta["cali_t"] = [float(t) for t in np.asarray(cali_t)]
    return cali_model(adapter, params, w_cali,
                      a_cali if qargs.use_aq else None, hp=hp,
                      use_aq=qargs.use_aq,
                      running_stat=qargs.running_stat,
                      path=qargs.cali_save_path,
                      key=key if key is not None
                      else jax.random.PRNGKey(qargs.seed), meta=meta,
                      capture_batch_size=capture_batch_size,
                      mesh=mesh, resume_dir=resume_dir)
