"""LDM-family samplers as `lax.scan` programs: DDIM, PLMS, DPM-Solver++.

Re-specifies /root/reference/stable-diffusion/ldm/models/diffusion/
{ddim.py, plms.py, dpm_solver/dpm_solver.py} TPU-first: all schedule
quantities (timesteps, alphas, sigmas, lambdas) are precomputed host-side
per step; the whole rollout is one jitted scan; classifier-free guidance
is a double-batched model wrapper (ddim.py:178-185, plms.py:187-193);
harvest mode emits every per-step model input in one O(T) rollout
(replacing the per-t ``untill_fake_t`` re-sampling, data_generate.py).

model_fn signature: (x, t_batch, step_index) -> eps. FSC activation
params are selected per step via ``group_of_step`` (see
quant/inference.py); LDM keys FSC groups by real timestep
(ddpm.py:1403-1405) — use :func:`group_of_step_from_t`.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(schedule: str, n_timestep: int,
                       linear_start=1e-4, linear_end=2e-2,
                       cosine_s=8e-3) -> np.ndarray:
    """diffusionmodules/util.py:21-44."""
    if schedule == "linear":
        return np.linspace(linear_start ** 0.5, linear_end ** 0.5,
                           n_timestep, dtype=np.float64) ** 2
    if schedule == "sqrt_linear":
        return np.linspace(linear_start, linear_end, n_timestep,
                           dtype=np.float64)
    if schedule == "cosine":
        ts = (np.arange(n_timestep + 1, dtype=np.float64) / n_timestep
              + cosine_s)
        alphas = np.cos(ts / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        return np.clip(betas, 0, 0.999)
    if schedule == "sqrt":
        return np.linspace(linear_start, linear_end, n_timestep,
                           dtype=np.float64) ** 0.5
    raise ValueError(schedule)


def make_ddim_timesteps(num_ddim_steps: int, num_ddpm_steps: int,
                        discr_method: str = "uniform") -> np.ndarray:
    """diffusionmodules/util.py:47-60 (note the +1 shift)."""
    if discr_method == "uniform":
        c = num_ddpm_steps // num_ddim_steps
        steps = np.asarray(list(range(0, num_ddpm_steps, c)))
    elif discr_method == "quad":
        steps = (np.linspace(0, np.sqrt(num_ddpm_steps * 0.8),
                             num_ddim_steps) ** 2).astype(int)
    else:
        raise NotImplementedError(discr_method)
    return steps + 1


class DDIMScheduleLDM:
    """Per-step DDIM quantities (make_ddim_sampling_parameters,
    util.py:63-75), in *sampling order* (descending t)."""

    def __init__(self, alphas_cumprod: np.ndarray, ddim_timesteps:
                 np.ndarray, eta: float = 0.0):
        ac = np.asarray(alphas_cumprod, np.float64)
        ts = np.asarray(ddim_timesteps)
        alphas = ac[ts]
        alphas_prev = np.concatenate([[ac[0]], ac[ts[:-1]]])
        sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas)
                               * (1 - alphas / alphas_prev))
        # sampling order = reversed
        self.t = ts[::-1].copy()                       # (S,)
        self.a_t = alphas[::-1].copy()
        self.a_prev = alphas_prev[::-1].copy()
        self.sigma = sigmas[::-1].copy()
        self.sqrt_1m_a = np.sqrt(1.0 - self.a_t)
        self.num_steps = len(ts)


def ddim_scan_ldm(model_fn, sched: DDIMScheduleLDM, x: jax.Array,
                  key: Optional[jax.Array] = None, collect: str = "none"):
    """p_sample_ddim loop (ddim.py:123-175 core math shared with
    plms.get_x_prev_and_pred_x0)."""
    t_arr = jnp.asarray(sched.t, jnp.int32)
    a_t = jnp.asarray(sched.a_t, jnp.float32)
    a_prev = jnp.asarray(sched.a_prev, jnp.float32)
    sigma = jnp.asarray(sched.sigma, jnp.float32)
    s1ma = jnp.asarray(sched.sqrt_1m_a, jnp.float32)
    n = x.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)

    def step(carry, i):
        xt = carry
        t_b = jnp.full((n,), t_arr[i], jnp.int32)
        e_t = model_fn(xt, t_b, i)
        pred_x0 = (xt - s1ma[i] * e_t) / jnp.sqrt(a_t[i])
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev[i] - sigma[i] ** 2,
                                      0.0)) * e_t
        noise = sigma[i] * jax.random.normal(jax.random.fold_in(key, i),
                                             xt.shape, xt.dtype)
        x_prev = jnp.sqrt(a_prev[i]) * pred_x0 + dir_xt + noise
        out = (xt, t_b) if collect == "traj" else None
        return x_prev, out

    x_last, ys = jax.lax.scan(step, x, jnp.arange(sched.num_steps))
    return x_last if collect == "none" else (x_last, ys)


def plms_scan(model_fn, sched: DDIMScheduleLDM, x: jax.Array,
              collect: str = "none"):
    """PLMS sampling loop (plms.py:120-240): Adams-Bashforth multistep on
    eps with an extra Euler-correction model eval at step 0. The rolling
    buffer of the 3 previous eps lives in the scan carry."""
    assert sched.num_steps >= 1
    t_arr = jnp.asarray(sched.t, jnp.int32)
    t_next_arr = jnp.asarray(
        np.concatenate([sched.t[1:], sched.t[-1:]]), jnp.int32)
    a_t = jnp.asarray(sched.a_t, jnp.float32)
    a_prev = jnp.asarray(sched.a_prev, jnp.float32)
    s1ma = jnp.asarray(sched.sqrt_1m_a, jnp.float32)
    n = x.shape[0]

    def x_prev_from(e, xt, i):
        pred_x0 = (xt - s1ma[i] * e) / jnp.sqrt(a_t[i])
        dir_xt = jnp.sqrt(1.0 - a_prev[i]) * e
        return jnp.sqrt(a_prev[i]) * pred_x0 + dir_xt

    def step(carry, i):
        xt, eps_buf = carry  # eps_buf: (3, ...) newest-first
        t_b = jnp.full((n,), t_arr[i], jnp.int32)
        e_t = model_fn(xt, t_b, i)

        def order1(_):
            # Pseudo Improved Euler: average with eps at (x_prev, t_next)
            x_prev1 = x_prev_from(e_t, xt, i)
            tn_b = jnp.full((n,), t_next_arr[i], jnp.int32)
            e_next = model_fn(x_prev1, tn_b,
                              jnp.minimum(i + 1, sched.num_steps - 1))
            return (e_t + e_next) / 2.0

        def order2(_):
            return (3.0 * e_t - eps_buf[0]) / 2.0

        def order3(_):
            return (23.0 * e_t - 16.0 * eps_buf[0] + 5.0 * eps_buf[1]) \
                / 12.0

        def order4(_):
            return (55.0 * e_t - 59.0 * eps_buf[0] + 37.0 * eps_buf[1]
                    - 9.0 * eps_buf[2]) / 24.0

        e_prime = jax.lax.switch(jnp.minimum(i, 3),
                                 [order1, order2, order3, order4], None)
        x_prev = x_prev_from(e_prime, xt, i)
        eps_buf = jnp.concatenate([e_t[None], eps_buf[:-1]])
        out = (xt, t_b) if collect == "traj" else None
        return (x_prev, eps_buf), out

    eps_buf0 = jnp.zeros((3,) + x.shape, x.dtype)
    (x_last, _), ys = jax.lax.scan(step, (x, eps_buf0),
                                   jnp.arange(sched.num_steps))
    return x_last if collect == "none" else (x_last, ys)


# ---------------------------------------------------------------------------
# DPM-Solver++ (2M), discrete noise schedule
# ---------------------------------------------------------------------------

class DPMSchedule:
    """NoiseScheduleVP('discrete') quantities sampled at uniform
    continuous times (dpm_solver.py:95-160, 410-436): S+1 times from
    T=1 to 1/N; alpha/sigma/lambda by linear interpolation of
    0.5*log(alphas_cumprod) over t_array = linspace(0,1,N+1)[1:]."""

    def __init__(self, alphas_cumprod: np.ndarray, steps: int):
        ac = np.asarray(alphas_cumprod, np.float64)
        n = len(ac)
        log_alpha = 0.5 * np.log(ac)
        t_array = np.linspace(0.0, 1.0, n + 1)[1:]
        t_cont = np.linspace(1.0, 1.0 / n, steps + 1)
        la = np.interp(t_cont, t_array, log_alpha)
        self.t_cont = t_cont
        self.model_t = (t_cont - 1.0 / n) * 1000.0   # model input times
        self.log_alpha = la
        self.alpha = np.exp(la)
        self.sigma = np.sqrt(1.0 - np.exp(2.0 * la))
        self.lam = la - 0.5 * np.log(1.0 - np.exp(2.0 * la))
        self.steps = steps


def dpm_solver_pp_2m_scan(model_fn, sched: DPMSchedule, x: jax.Array,
                          lower_order_final: bool = True,
                          collect: str = "none"):
    """DPM-Solver++ multistep order-2 with x0 prediction
    (dpm_solver.py:755-795 'dpm_solver' type, sample() multistep loop
    :1075-1115). model_fn returns EPS; x0 conversion uses the schedule.
    NFE = steps (one model eval per step, incl. the init)."""
    steps = sched.steps
    lam = jnp.asarray(sched.lam, jnp.float32)
    alpha = jnp.asarray(sched.alpha, jnp.float32)
    sigma = jnp.asarray(sched.sigma, jnp.float32)
    model_t = jnp.asarray(sched.model_t, jnp.float32)
    n = x.shape[0]

    def x0_pred(xt, i):
        t_b = jnp.full((n,), model_t[i], jnp.float32)
        eps = model_fn(xt, t_b, i)
        return (xt - sigma[i] * eps) / alpha[i], (xt, t_b)

    # init: model at t_0 (index 0)
    m0, tap0 = x0_pred(x, 0)

    # per-step (i = 1..steps) second-order weight: 0 at the first update
    # and (when lower_order_final and steps < 15) at the final update
    w2 = np.full(steps + 1, 0.5)
    w2[1] = 0.0
    if lower_order_final and steps < 15:
        w2[steps] = 0.0

    w2 = jnp.asarray(w2, jnp.float32)

    def step(carry, i):
        xt, m_prev, m_prev_prev, lam_pp = carry
        h = lam[i] - lam[i - 1]
        h0 = lam[i - 1] - lam_pp
        r0 = jnp.where(h0 != 0, h0 / h, 1.0)
        d1 = (m_prev - m_prev_prev) / jnp.maximum(r0, 1e-12)
        phi = jnp.expm1(-h)
        x_t = (sigma[i] / sigma[i - 1]) * xt \
            - alpha[i] * phi * m_prev \
            - w2[i] * alpha[i] * phi * d1
        is_last = i == steps
        m_new, tap = jax.lax.cond(
            is_last,
            lambda _: (m_prev, (x_t, jnp.full((n,), model_t[i],
                                              jnp.float32))),
            lambda _: x0_pred(x_t, i),
            None)
        return (x_t, m_new, m_prev, lam[i - 1]), tap

    carry0 = (x, m0, m0, lam[0])
    (x_last, _, _, _), taps = jax.lax.scan(step, carry0,
                                           jnp.arange(1, steps + 1))
    if collect == "none":
        return x_last
    xs = jnp.concatenate([tap0[0][None], taps[0][:-1]])
    ts = jnp.concatenate([tap0[1][None], taps[1][:-1]])
    return x_last, (xs, ts)


# ---------------------------------------------------------------------------
# classifier-free guidance + FSC helpers
# ---------------------------------------------------------------------------

def make_cfg_model_fn(apply_fn: Callable, cond: jax.Array,
                      uncond: jax.Array, scale: float) -> Callable:
    """Double-batched CFG exactly as the reference samplers
    (ddim.py:178-185): model([x;x], [t;t], [uc;c]) then
    e = e_uc + scale (e_c - e_uc). ``apply_fn(x, t, c, step) -> eps``."""

    def model_fn(x, t, step):
        x_in = jnp.concatenate([x, x])
        t_in = jnp.concatenate([t, t])
        c_in = jnp.concatenate([uncond, cond])
        e = apply_fn(x_in, t_in, c_in, step)
        e_uc, e_c = jnp.split(e, 2)
        return e_uc + scale * (e_c - e_uc)

    return model_fn


def group_of_step_from_t(cali_t: np.ndarray,
                         sample_t: np.ndarray) -> np.ndarray:
    """Map each sampling step's timestep to the nearest calibration
    group's timestep — the generalization of the reference's
    ``act_{t_max - (t-1)//tot}`` arithmetic (ddpm.py:1403-1405), robust
    to differing step counts."""
    cali_t = np.asarray(cali_t, np.float64)
    sample_t = np.asarray(sample_t, np.float64)
    return np.argmin(np.abs(sample_t[:, None] - cali_t[None, :]), axis=1)
