"""General DPM-Solver / DPM-Solver++ suite, TPU-native.

Feature parity with the reference's dpm_solver.py (orders 1-3,
singlestep / multistep / singlestep_fixed / adaptive methods,
'dpmsolver' noise-prediction and 'dpmsolver++' data-prediction
algorithms, 'dpm_solver' and 'taylor' expansion types, the three skip
types, lower_order_final, denoise_to_zero) — re-designed for XLA:

- Every sampling time is statically known for the fixed-step methods,
  so ALL schedule quantities (lambda, alpha, sigma, the phi_k
  coefficients, per-step solver order) are precomputed on host in
  float64 at trace time. The compiled program contains only model
  evaluations and fused axpy math with baked scalar coefficients — no
  interpolation, no schedule lookups, no Python control flow.
- The multistep loop is ONE uniform ``lax.scan`` body: the varying
  per-step order (warmup 1,2,...,order and the lower_order_final tail)
  is encoded in static coefficient arrays (a zero coefficient turns a
  higher-order difference term off), so there is no lax.switch and no
  recompilation across orders.
- Singlestep methods unroll the (<= steps) outer blocks at trace time;
  each block is `order` model evals with baked coefficients.
- The adaptive method is the one data-dependent loop; it runs as a
  ``lax.while_loop`` with device-side schedule math.

Reference semantics being matched (file:line in /root/reference):
stable-diffusion/ldm/models/diffusion/dpm_solver/dpm_solver.py —
NoiseScheduleVP :6-175, model_wrapper :177-349, get_time_steps
:410-437, singlestep order plan :439-496, first/second/third updates
:504-753, multistep updates :755-857, adaptive :909-963, sample
:965-1113. The TFMQ entry flow (sampler.py:82-83) is multistep
order-2 dpmsolver++ time_uniform lower_order_final.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Noise schedule (host-side float64; device-side variants for adaptive)
# ---------------------------------------------------------------------------

class NoiseSchedule:
    """VP-SDE noise schedule: 'discrete' (piecewise-linear interpolation
    of 0.5*log(alphas_cumprod), dpm_solver.py:81-122), 'linear'
    (DDPM closed form) or 'cosine' (improved-DDPM closed form).

    All methods take/return numpy float64 on host — the fixed-step
    solvers bake these values into the jitted program. ``*_jnp``
    variants mirror them on device for the adaptive solver.
    """

    def __init__(self, schedule: str = "discrete",
                 alphas_cumprod: Optional[np.ndarray] = None,
                 beta_0: float = 0.1, beta_1: float = 20.0,
                 cosine_s: float = 0.008):
        if schedule not in ("discrete", "linear", "cosine"):
            raise ValueError(f"unsupported schedule {schedule!r}")
        self.schedule = schedule
        if schedule == "discrete":
            if alphas_cumprod is None:
                raise ValueError("discrete schedule needs alphas_cumprod")
            ac = np.asarray(alphas_cumprod, np.float64)
            self.total_N = len(ac)
            self.T = 1.0
            # t_array = linspace(0,1,N+1)[1:]; log_alpha sampled there
            self.t_array = np.linspace(0.0, 1.0, self.total_N + 1)[1:]
            self.log_alpha_array = 0.5 * np.log(ac)
        else:
            self.total_N = 1000
            self.beta_0, self.beta_1 = float(beta_0), float(beta_1)
            self.cosine_s = float(cosine_s)
            self.cosine_log_alpha_0 = math.log(
                math.cos(cosine_s / (1.0 + cosine_s) * math.pi / 2.0))
            if schedule == "cosine":
                # T=1 is numerically singular for cosine
                cosine_beta_max = 999.0
                t_max = (math.atan(cosine_beta_max * (1.0 + cosine_s)
                                   / math.pi) * 2.0 * (1.0 + cosine_s)
                         / math.pi - cosine_s)
                self.T = 0.9946
                self.cosine_t_max = t_max
            else:
                self.T = 1.0

    # -- host (numpy, float64) --

    def log_mean_coeff(self, t):
        t = np.asarray(t, np.float64)
        if self.schedule == "discrete":
            return np.interp(t, self.t_array, self.log_alpha_array)
        if self.schedule == "linear":
            return (-0.25 * t ** 2 * (self.beta_1 - self.beta_0)
                    - 0.5 * t * self.beta_0)
        s = self.cosine_s
        return (np.log(np.cos((t + s) / (1.0 + s) * math.pi / 2.0))
                - self.cosine_log_alpha_0)

    def marginal_alpha(self, t):
        return np.exp(self.log_mean_coeff(t))

    def marginal_std(self, t):
        return np.sqrt(1.0 - np.exp(2.0 * self.log_mean_coeff(t)))

    def marginal_lambda(self, t):
        la = self.log_mean_coeff(t)
        return la - 0.5 * np.log1p(-np.exp(2.0 * la))

    def inverse_lambda(self, lam):
        lam = np.asarray(lam, np.float64)
        if self.schedule == "linear":
            tmp = (2.0 * (self.beta_1 - self.beta_0)
                   * np.logaddexp(-2.0 * lam, 0.0))
            delta = self.beta_0 ** 2 + tmp
            return tmp / (np.sqrt(delta) + self.beta_0) \
                / (self.beta_1 - self.beta_0)
        if self.schedule == "discrete":
            log_alpha = -0.5 * np.logaddexp(0.0, -2.0 * lam)
            # log_alpha_array is decreasing in t: interp on the flip
            return np.interp(log_alpha, self.log_alpha_array[::-1],
                             self.t_array[::-1])
        s = self.cosine_s
        log_alpha = -0.5 * np.logaddexp(-2.0 * lam, 0.0)
        t = (np.arccos(np.exp(log_alpha + self.cosine_log_alpha_0))
             * 2.0 * (1.0 + s) / math.pi - s)
        return t

    # -- device (jnp, for the adaptive while_loop) --

    def log_mean_coeff_jnp(self, t):
        if self.schedule == "discrete":
            return jnp.interp(t, jnp.asarray(self.t_array),
                              jnp.asarray(self.log_alpha_array))
        if self.schedule == "linear":
            return (-0.25 * t ** 2 * (self.beta_1 - self.beta_0)
                    - 0.5 * t * self.beta_0)
        s = self.cosine_s
        return (jnp.log(jnp.cos((t + s) / (1.0 + s) * jnp.pi / 2.0))
                - self.cosine_log_alpha_0)

    def marginal_lambda_jnp(self, t):
        la = self.log_mean_coeff_jnp(t)
        return la - 0.5 * jnp.log1p(-jnp.exp(2.0 * la))

    def inverse_lambda_jnp(self, lam):
        if self.schedule == "linear":
            tmp = (2.0 * (self.beta_1 - self.beta_0)
                   * jnp.logaddexp(-2.0 * lam, 0.0))
            delta = self.beta_0 ** 2 + tmp
            return tmp / (jnp.sqrt(delta) + self.beta_0) \
                / (self.beta_1 - self.beta_0)
        if self.schedule == "discrete":
            log_alpha = -0.5 * jnp.logaddexp(0.0, -2.0 * lam)
            return jnp.interp(log_alpha,
                              jnp.asarray(self.log_alpha_array[::-1]),
                              jnp.asarray(self.t_array[::-1]))
        s = self.cosine_s
        log_alpha = -0.5 * jnp.logaddexp(-2.0 * lam, 0.0)
        return (jnp.arccos(jnp.exp(log_alpha + self.cosine_log_alpha_0))
                * 2.0 * (1.0 + s) / jnp.pi - s)

    def model_time(self, t_cont):
        """Continuous time -> the model's input time
        (dpm_solver.py:278-287): (t - 1/N) * 1000 for discrete
        schedules (the reference multiplies by 1000 regardless of N);
        continuous-time models take t unscaled."""
        t_cont = np.asarray(t_cont, np.float64)
        if self.schedule == "discrete":
            return (t_cont - 1.0 / self.total_N) * 1000.0
        return t_cont


def model_wrapper(apply_fn: Callable, ns: NoiseSchedule, *,
                  model_type: str = "noise",
                  guidance_type: str = "uncond",
                  condition=None, unconditional_condition=None,
                  guidance_scale: float = 1.0,
                  classifier_fn: Optional[Callable] = None,
                  classifier_scale: float = 1.0) -> Callable:
    """Wrap a model into the continuous-time NOISE prediction function
    the solver consumes (dpm_solver.py:177-349).

    apply_fn(x, t_model[, cond]) -> model output of ``model_type``:
    'noise' | 'x_start' | 'v' | 'score'. guidance_type: 'uncond',
    'classifier' (classifier_fn(x, t_model, cond) -> logprob, guided
    via its input-gradient), or 'classifier-free' (CFG double batch).
    Returns model_fn(x, t_model, step) -> eps, matching the (x, t,
    step) calling convention of the samplers in this package.
    """

    def to_noise(x, t_model, out):
        if ns.schedule == "discrete":
            t_cont = t_model / 1000.0 + 1.0 / ns.total_N
        else:
            t_cont = t_model
        if model_type == "noise":
            return out
        la = ns.log_mean_coeff_jnp(t_cont)
        alpha = jnp.exp(la)
        sigma = jnp.sqrt(1.0 - jnp.exp(2.0 * la))
        bshape = (-1,) + (1,) * (x.ndim - 1)
        alpha = alpha.reshape(bshape).astype(x.dtype)
        sigma = sigma.reshape(bshape).astype(x.dtype)
        if model_type == "x_start":
            return (x - alpha * out) / sigma
        if model_type == "v":
            return alpha * out + sigma * x
        if model_type == "score":
            return -sigma * out
        raise ValueError(f"unknown model_type {model_type!r}")

    def noise_pred(x, t_model, step, cond=None):
        if cond is None:
            out = apply_fn(x, t_model)
        else:
            out = apply_fn(x, t_model, cond)
        return to_noise(x, t_model, out)

    if guidance_type == "uncond":
        def model_fn(x, t_model, step):
            return noise_pred(x, t_model, step)
    elif guidance_type == "classifier":
        if classifier_fn is None:
            raise ValueError("classifier guidance needs classifier_fn")

        def model_fn(x, t_model, step):
            grad = jax.grad(
                lambda xx: jnp.sum(
                    classifier_fn(xx, t_model, condition)))(x)
            eps = noise_pred(x, t_model, step)
            if ns.schedule == "discrete":
                t_cont = t_model / 1000.0 + 1.0 / ns.total_N
            else:
                t_cont = t_model
            la = ns.log_mean_coeff_jnp(t_cont)
            sigma = jnp.sqrt(1.0 - jnp.exp(2.0 * la))
            sigma = sigma.reshape((-1,) + (1,) * (x.ndim - 1))
            return eps - classifier_scale * sigma.astype(x.dtype) * grad
    elif guidance_type == "classifier-free":
        def model_fn(x, t_model, step):
            if guidance_scale == 1.0:
                return noise_pred(x, t_model, step, condition)
            x2 = jnp.concatenate([x, x])
            t2 = jnp.concatenate([t_model, t_model])
            c2 = jnp.concatenate([unconditional_condition, condition])
            e2 = noise_pred(x2, t2, step, c2)
            e_uc, e_c = jnp.split(e2, 2)
            return e_uc + guidance_scale * (e_c - e_uc)
    else:
        raise ValueError(f"unknown guidance_type {guidance_type!r}")
    return model_fn


# ---------------------------------------------------------------------------
# time grids and order plans (host, static)
# ---------------------------------------------------------------------------

def get_time_steps(ns: NoiseSchedule, skip_type: str, t_T: float,
                   t_0: float, N: int) -> np.ndarray:
    """dpm_solver.py:410-437."""
    if skip_type == "logSNR":
        lam_T = ns.marginal_lambda(t_T)
        lam_0 = ns.marginal_lambda(t_0)
        return ns.inverse_lambda(np.linspace(lam_T, lam_0, N + 1))
    if skip_type == "time_uniform":
        return np.linspace(t_T, t_0, N + 1)
    if skip_type == "time_quadratic":
        return np.linspace(t_T ** 0.5, t_0 ** 0.5, N + 1) ** 2
    raise ValueError(f"unsupported skip_type {skip_type!r}")


def singlestep_order_plan(steps: int, order: int) -> Sequence[int]:
    """'DPM-Solver-fast' order allocation (dpm_solver.py:439-496)."""
    if order == 3:
        k = steps // 3 + 1
        if steps % 3 == 0:
            return [3] * (k - 2) + [2, 1]
        if steps % 3 == 1:
            return [3] * (k - 1) + [1]
        return [3] * (k - 1) + [2]
    if order == 2:
        if steps % 2 == 0:
            return [2] * (steps // 2)
        return [2] * (steps // 2) + [1]
    if order == 1:
        return [1] * steps
    raise ValueError("order must be 1, 2 or 3")


# ---------------------------------------------------------------------------
# update math (shared by every method; coefficients are host floats)
# ---------------------------------------------------------------------------

def _solver_value(pp: bool, thresholding: bool, max_val: float,
                  x, eps, alpha, sigma):
    """The value the solver recurrences consume: raw eps for
    'dpmsolver', the x0 prediction (x - sigma*eps)/alpha — optionally
    Imagen-thresholded — for 'dpmsolver++' (dpm_solver.py:386-408)."""
    if not pp:
        return eps
    x0 = (x - sigma * eps) / alpha
    if thresholding:
        s = jnp.quantile(jnp.abs(x0).reshape(x0.shape[0], -1), 0.995,
                         axis=1)
        s = jnp.maximum(s, max_val).reshape(
            (-1,) + (1,) * (x0.ndim - 1)).astype(x0.dtype)
        x0 = jnp.clip(x0, -s, s) / s
    return x0

def _first_update_coeffs(ns, s, t, pp: bool):
    """(cx, cm): x_t = cx * x + cm * model_s  (dpm_solver.py:504-549)."""
    lam_s, lam_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
    h = lam_t - lam_s
    if pp:
        cx = ns.marginal_std(t) / ns.marginal_std(s)
        cm = -ns.marginal_alpha(t) * np.expm1(-h)
    else:
        cx = np.exp(ns.log_mean_coeff(t) - ns.log_mean_coeff(s))
        cm = -ns.marginal_std(t) * np.expm1(h)
    return float(cx), float(cm)


def _axpy(cx, x, *cms):
    out = cx * x
    for c, m in cms:
        out = out + c * m
    return out


def _singlestep_update(model_fn, ns, x, s, t, order, *, pp: bool,
                       taylor: bool, step_idx: int,
                       r1: Optional[float], r2: Optional[float],
                       taps: Optional[list],
                       thresholding: bool = False,
                       max_val: float = 1.0):
    """One singlestep update of the given order from time s to t; all
    coefficients host-side (dpm_solver.py:504-753). ``taps`` collects
    (x, t_model) at each model eval when not None."""
    n = x.shape[0]

    def evals(xx, t_cont):
        tm = jnp.full((n,), ns.model_time(t_cont), jnp.float32)
        if taps is not None:
            taps.append((xx, tm))
        eps = model_fn(xx, tm, step_idx)
        return _solver_value(pp, thresholding, max_val, xx, eps,
                             float(ns.marginal_alpha(t_cont)),
                             float(ns.marginal_std(t_cont)))

    if order == 1:
        cx, cm = _first_update_coeffs(ns, s, t, pp)
        return _axpy(cx, x, (cm, evals(x, s)))

    lam_s, lam_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
    h = lam_t - lam_s
    if order == 2:
        r1 = 0.5 if r1 is None else r1
        s1 = float(ns.inverse_lambda(lam_s + r1 * h))
        m_s = evals(x, s)
        cx1, cm1 = _first_update_coeffs(ns, s, s1, pp)
        x_s1 = _axpy(cx1, x, (cm1, m_s))
        m_s1 = evals(x_s1, s1)
        if pp:
            cx = ns.marginal_std(t) / ns.marginal_std(s)
            phi = np.expm1(-h)
            a_t = ns.marginal_alpha(t)
            if taylor:
                cd = a_t * (np.expm1(-h) / h + 1.0) / r1
            else:
                cd = -(0.5 / r1) * a_t * phi
            return _axpy(float(cx), x, (float(-a_t * phi), m_s),
                         (float(cd), m_s1 - m_s))
        cx = np.exp(ns.log_mean_coeff(t) - ns.log_mean_coeff(s))
        phi = np.expm1(h)
        sig_t = ns.marginal_std(t)
        if taylor:
            cd = -(1.0 / r1) * sig_t * (np.expm1(h) / h - 1.0)
        else:
            cd = -(0.5 / r1) * sig_t * phi
        return _axpy(float(cx), x, (float(-sig_t * phi), m_s),
                     (float(cd), m_s1 - m_s))

    assert order == 3
    r1 = 1.0 / 3.0 if r1 is None else r1
    r2 = 2.0 / 3.0 if r2 is None else r2
    s1 = float(ns.inverse_lambda(lam_s + r1 * h))
    s2 = float(ns.inverse_lambda(lam_s + r2 * h))
    m_s = evals(x, s)
    cx1, cm1 = _first_update_coeffs(ns, s, s1, pp)
    m_s1 = evals(_axpy(cx1, x, (cm1, m_s)), s1)
    if pp:
        sig = ns.marginal_std
        a_s2, a_t = ns.marginal_alpha(s2), ns.marginal_alpha(t)
        phi_12 = np.expm1(-r2 * h)
        phi_22 = np.expm1(-r2 * h) / (r2 * h) + 1.0
        x_s2 = _axpy(float(sig(s2) / sig(s)), x,
                     (float(-a_s2 * phi_12), m_s),
                     (float(r2 / r1 * a_s2 * phi_22), m_s1 - m_s))
        m_s2 = evals(x_s2, s2)
        phi_1 = np.expm1(-h)
        phi_2 = phi_1 / h + 1.0
        phi_3 = phi_2 / h - 0.5
        if taylor:
            d1_0 = (1.0 / r1) * (m_s1 - m_s)
            d1_1 = (1.0 / r2) * (m_s2 - m_s)
            d1 = (r2 * d1_0 - r1 * d1_1) / (r2 - r1)
            d2 = 2.0 * (d1_1 - d1_0) / (r2 - r1)
            return _axpy(float(sig(t) / sig(s)), x,
                         (float(-a_t * phi_1), m_s),
                         (float(a_t * phi_2), d1),
                         (float(-a_t * phi_3), d2))
        return _axpy(float(sig(t) / sig(s)), x,
                     (float(-a_t * phi_1), m_s),
                     (float(a_t * phi_2 / r2), m_s2 - m_s))
    la = ns.log_mean_coeff
    sig_s2, sig_t = ns.marginal_std(s2), ns.marginal_std(t)
    phi_12 = np.expm1(r2 * h)
    phi_22 = np.expm1(r2 * h) / (r2 * h) - 1.0
    x_s2 = _axpy(float(np.exp(la(s2) - la(s))), x,
                 (float(-sig_s2 * phi_12), m_s),
                 (float(-r2 / r1 * sig_s2 * phi_22), m_s1 - m_s))
    m_s2 = evals(x_s2, s2)
    phi_1 = np.expm1(h)
    phi_2 = phi_1 / h - 1.0
    phi_3 = phi_2 / h - 0.5
    if taylor:
        d1_0 = (1.0 / r1) * (m_s1 - m_s)
        d1_1 = (1.0 / r2) * (m_s2 - m_s)
        d1 = (r2 * d1_0 - r1 * d1_1) / (r2 - r1)
        d2 = 2.0 * (d1_1 - d1_0) / (r2 - r1)
        return _axpy(float(np.exp(la(t) - la(s))), x,
                     (float(-sig_t * phi_1), m_s),
                     (float(-sig_t * phi_2), d1),
                     (float(-sig_t * phi_3), d2))
    return _axpy(float(np.exp(la(t) - la(s))), x,
                 (float(-sig_t * phi_1), m_s),
                 (float(-sig_t * phi_2 / r2), m_s2 - m_s))


def eval_times(ns: NoiseSchedule, *, steps: int = 20, order: int = 3,
               method: str = "multistep",
               skip_type: str = "time_uniform",
               t_start: Optional[float] = None,
               t_end: Optional[float] = None) -> np.ndarray:
    """The static model-input times of every model eval a fixed-step
    configuration performs, in order — the per-timestep axis FSC
    calibrates over (one entry per NFE; matches ``collect='traj'``
    tap times exactly)."""
    t_0 = 1.0 / ns.total_N if t_end is None else t_end
    t_T = ns.T if t_start is None else t_start
    if method == "multistep":
        ts = get_time_steps(ns, skip_type, t_T, t_0, steps)
        return ns.model_time(ts[:steps])
    if method in ("singlestep", "singlestep_fixed"):
        if method == "singlestep":
            orders = singlestep_order_plan(steps, order)
            if skip_type == "logSNR":
                ts_outer = get_time_steps(ns, skip_type, t_T, t_0,
                                          len(orders))
            else:
                ts = get_time_steps(ns, skip_type, t_T, t_0, steps)
                ts_outer = ts[np.cumsum([0] + list(orders))]
        else:
            k = steps // order
            orders = [order] * k
            ts_outer = get_time_steps(ns, skip_type, t_T, t_0, k)
        out = []
        for i, od in enumerate(orders):
            s_i, t_i = float(ts_outer[i]), float(ts_outer[i + 1])
            lam = ns.marginal_lambda(
                get_time_steps(ns, skip_type, s_i, t_i, od))
            h = lam[-1] - lam[0]
            out.append(s_i)
            if od >= 2:
                r1 = (lam[1] - lam[0]) / h
                out.append(float(ns.inverse_lambda(lam[0] + r1 * h)))
            if od == 3:
                r2 = (lam[2] - lam[0]) / h
                out.append(float(ns.inverse_lambda(lam[0] + r2 * h)))
        return ns.model_time(np.asarray(out))
    raise ValueError(f"no static eval times for method {method!r}")


# ---------------------------------------------------------------------------
# the sampler
# ---------------------------------------------------------------------------

def dpm_solver_sample(model_fn, ns: NoiseSchedule, x: jax.Array, *,
                      steps: int = 20, order: int = 3,
                      method: str = "multistep",
                      skip_type: str = "time_uniform",
                      algorithm_type: str = "dpmsolver++",
                      solver_type: str = "dpm_solver",
                      lower_order_final: bool = True,
                      denoise_to_zero: bool = False,
                      t_start: Optional[float] = None,
                      t_end: Optional[float] = None,
                      atol: float = 0.0078, rtol: float = 0.05,
                      thresholding: bool = False, max_val: float = 1.0,
                      collect: str = "none"):
    """Sample with any DPM-Solver configuration (dpm_solver.py:965-1113
    ``DPM_Solver.sample`` surface). model_fn(x, t_model, step) -> eps.

    ``collect='traj'`` (fixed-step methods only) also returns the
    (x, t_model) pairs seen by every model eval — the calibration
    harvest that replaces the reference's ``untill_fake_t`` re-runs.
    """
    pp = {"dpmsolver++": True, "dpmsolver": False}[algorithm_type]
    taylor = {"taylor": True, "dpm_solver": False}[solver_type]
    t_0 = 1.0 / ns.total_N if t_end is None else t_end
    t_T = ns.T if t_start is None else t_start
    taps = [] if collect == "traj" else None

    if method == "adaptive":
        if collect != "none":
            raise ValueError("collect is not supported for adaptive")
        x = _adaptive(model_fn, ns, x, order, t_T, t_0, pp=pp,
                      taylor=taylor, atol=atol, rtol=rtol,
                      thresholding=thresholding, max_val=max_val)
        t_last = t_0
    elif method == "multistep":
        x, t_last = _multistep(model_fn, ns, x, steps, order, skip_type,
                               pp=pp, taylor=taylor,
                               lower_order_final=lower_order_final,
                               t_T=t_T, t_0=t_0, taps=taps,
                               thresholding=thresholding,
                               max_val=max_val)
    elif method in ("singlestep", "singlestep_fixed"):
        if method == "singlestep":
            orders = singlestep_order_plan(steps, order)
            if skip_type == "logSNR":
                ts_outer = get_time_steps(ns, skip_type, t_T, t_0,
                                          len(orders))
            else:
                ts = get_time_steps(ns, skip_type, t_T, t_0, steps)
                ts_outer = ts[np.cumsum([0] + list(orders))]
        else:
            k = steps // order
            orders = [order] * k
            ts_outer = get_time_steps(ns, skip_type, t_T, t_0, k)
        for i, od in enumerate(orders):
            s_i, t_i = float(ts_outer[i]), float(ts_outer[i + 1])
            # inner nodes at uniform logSNR inside the block
            lam = ns.marginal_lambda(
                get_time_steps(ns, skip_type, s_i, t_i, od))
            h = lam[-1] - lam[0]
            r1 = None if od <= 1 else float((lam[1] - lam[0]) / h)
            r2 = None if od <= 2 else float((lam[2] - lam[0]) / h)
            x = _singlestep_update(model_fn, ns, x, s_i, t_i, od,
                                   pp=pp, taylor=taylor, step_idx=i,
                                   r1=r1, r2=r2, taps=taps,
                                   thresholding=thresholding,
                                   max_val=max_val)
        t_last = float(ts_outer[-1])
    else:
        raise ValueError(f"unknown method {method!r}")

    if denoise_to_zero:
        # first-order step to t=0 == x0 prediction at t_last
        # (dpm_solver.py:498-502)
        n = x.shape[0]
        tm = jnp.full((n,), ns.model_time(t_last), jnp.float32)
        if taps is not None:
            taps.append((x, tm))
        eps = model_fn(x, tm, steps)
        x = _solver_value(True, thresholding, max_val, x, eps,
                          float(ns.marginal_alpha(t_last)),
                          float(ns.marginal_std(t_last)))

    if collect == "none":
        return x
    xs = jnp.stack([p[0] for p in taps])
    ts = jnp.stack([p[1] for p in taps])
    return x, (xs, ts)


def _multistep(model_fn, ns, x, steps, order, skip_type, *, pp, taylor,
               lower_order_final, t_T, t_0, taps,
               thresholding=False, max_val=1.0):
    """Multistep loop (dpm_solver.py:1075-1115) as one uniform
    lax.scan: per-step order is encoded in static coefficients.

    General update (covers orders 1-3, both algorithms, both types):
        d10  = e_i * (m0 - m1)
        d11  = f_i * (m1 - m2)
        diff = d10 - d11
        x'   = a_i*x + b_i*m0 + c_i*(d10 + g_i*diff) + d_i*diff
    order 1: c=d=0 · order 2 dpm_solver: c=-0.5*B, g=0, d=0 (B below)
    · order 2 taylor: c=phi2-coef · order 3: c,g,d from D1/D2 algebra.
    """
    assert steps >= order
    ts = get_time_steps(ns, skip_type, t_T, t_0, steps)
    lam = ns.marginal_lambda(ts)
    sig = ns.marginal_std(ts)
    alp = ns.marginal_alpha(ts)
    la = ns.log_mean_coeff(ts)
    tm = ns.model_time(ts)

    A = np.zeros(steps + 1)
    B = np.zeros(steps + 1)
    C = np.zeros(steps + 1)
    D = np.zeros(steps + 1)
    E = np.zeros(steps + 1)   # e_i
    F = np.zeros(steps + 1)   # f_i
    G = np.zeros(steps + 1)   # g_i
    for i in range(1, steps + 1):
        if lower_order_final and steps < 15:
            od = min(order, min(i, steps + 1 - i))
        else:
            od = min(order, i)
        h = lam[i] - lam[i - 1]
        if pp:
            A[i] = sig[i] / sig[i - 1]
            B[i] = -alp[i] * np.expm1(-h)
        else:
            A[i] = np.exp(la[i] - la[i - 1])
            B[i] = -sig[i] * np.expm1(h)
        if od >= 2:
            h0 = lam[i - 1] - lam[i - 2]
            r0 = h0 / h
            E[i] = 1.0 / r0
            if od == 2:
                if taylor:
                    C[i] = (alp[i] * (np.expm1(-h) / h + 1.0) if pp
                            else -sig[i] * (np.expm1(h) / h - 1.0))
                else:
                    C[i] = 0.5 * B[i]
            else:
                h1 = lam[i - 2] - lam[i - 3]
                r1 = h1 / h
                F[i] = 1.0 / r1
                G[i] = r0 / (r0 + r1)
                C[i] = (alp[i] * (np.expm1(-h) / h + 1.0) if pp
                        else -sig[i] * (np.expm1(h) / h - 1.0))
                phi3 = ((np.expm1(-h) + h) / h ** 2 - 0.5 if pp
                        else (np.expm1(h) - h) / h ** 2 - 0.5)
                D[i] = ((-alp[i] if pp else -sig[i]) * phi3
                        / (r0 + r1))
    consts = [jnp.asarray(v, jnp.float32)
              for v in (A, B, C, D, E, F, G, tm, alp, sig)]
    A_, B_, C_, D_, E_, F_, G_, tm_, alp_, sig_ = consts
    n = x.shape[0]

    def eval_model(xx, i):
        t_b = jnp.full((n,), tm_[i], jnp.float32)
        eps = model_fn(xx, t_b, i)
        m = _solver_value(pp, thresholding, max_val, xx, eps,
                          alp_[i], sig_[i])
        return m, (xx, t_b)

    m0, tap0 = eval_model(x, 0)

    def step(carry, i):
        xt, m0, m1, m2 = carry
        d10 = E_[i] * (m0 - m1)
        diff = d10 - F_[i] * (m1 - m2)
        x_t = (A_[i] * xt + B_[i] * m0
               + C_[i] * (d10 + G_[i] * diff) + D_[i] * diff)
        is_last = i == steps
        m_new, tap = jax.lax.cond(
            is_last,
            lambda _: (m0, (x_t, jnp.full((n,), tm_[i], jnp.float32))),
            lambda _: eval_model(x_t, i),
            None)
        return (x_t, m_new, m0, m1), tap

    carry0 = (x, m0, m0, m0)
    (x_last, _, _, _), scan_taps = jax.lax.scan(
        step, carry0, jnp.arange(1, steps + 1))
    if taps is not None:
        taps.append(tap0)
        for j in range(steps - 1):   # the last tap is never evaluated
            taps.append((scan_taps[0][j], scan_taps[1][j]))
    return x_last, float(ts[-1])


def _adaptive(model_fn, ns, x, order, t_T, t_0, *, pp, taylor,
              atol, rtol, h_init=0.05, theta=0.9, t_err=1e-5,
              thresholding=False, max_val=1.0):
    """Adaptive step size solver (dpm_solver.py:909-963) as a
    lax.while_loop; schedule math runs on device. order 2 pairs
    DPM-Solver-1 with singlestep-2; order 3 pairs singlestep-2 with
    singlestep-3. NFE is data-dependent."""
    if order not in (2, 3):
        raise ValueError("adaptive solver needs order 2 or 3")
    n = x.shape[0]
    lam_0 = ns.marginal_lambda_jnp(jnp.float32(t_0))

    def tmodel(t_cont):
        if ns.schedule == "discrete":
            tc = (t_cont - 1.0 / ns.total_N) * 1000.0
        else:
            tc = t_cont
        return jnp.full((n,), tc, jnp.float32)

    def sched(t):
        la = ns.log_mean_coeff_jnp(t)
        alpha = jnp.exp(la)
        sigma = jnp.sqrt(1.0 - jnp.exp(2.0 * la))
        lam = la - 0.5 * jnp.log1p(-jnp.exp(2.0 * la))
        return la, alpha, sigma, lam

    def mval(xx, t_cont):
        _, alpha, sigma, _ = sched(t_cont)
        eps = model_fn(xx, tmodel(t_cont), 0)
        return _solver_value(pp, thresholding, max_val, xx, eps,
                             alpha, sigma)

    def first_update(x, s, t, m_s):
        la_s, a_s, sig_s, lam_s = sched(s)
        la_t, a_t, sig_t, lam_t = sched(t)
        h = lam_t - lam_s
        if pp:
            return (sig_t / sig_s) * x - a_t * jnp.expm1(-h) * m_s
        return jnp.exp(la_t - la_s) * x - sig_t * jnp.expm1(h) * m_s

    def second_update(x, s, t, m_s, r1=0.5):
        la_s, a_s, sig_s, lam_s = sched(s)
        la_t, a_t, sig_t, lam_t = sched(t)
        h = lam_t - lam_s
        s1 = ns.inverse_lambda_jnp(lam_s + r1 * h)
        x_s1 = first_update(x, s, s1, m_s)
        m_s1 = mval(x_s1, s1)
        if pp:
            phi = jnp.expm1(-h)
            if taylor:
                cd = a_t * (jnp.expm1(-h) / h + 1.0) / r1
            else:
                cd = -(0.5 / r1) * a_t * phi
            return ((sig_t / sig_s) * x - a_t * phi * m_s
                    + cd * (m_s1 - m_s)), m_s1
        phi = jnp.expm1(h)
        if taylor:
            cd = -(1.0 / r1) * sig_t * (jnp.expm1(h) / h - 1.0)
        else:
            cd = -(0.5 / r1) * sig_t * phi
        return (jnp.exp(la_t - la_s) * x - sig_t * phi * m_s
                + cd * (m_s1 - m_s)), m_s1

    def third_update(x, s, t, m_s, m_s1, r1=1 / 3, r2=2 / 3):
        la_s, a_s, sig_s, lam_s = sched(s)
        la_t, a_t, sig_t, lam_t = sched(t)
        h = lam_t - lam_s
        s2 = ns.inverse_lambda_jnp(lam_s + r2 * h)
        la2, a_s2, sig_s2, _ = sched(s2)
        if pp:
            phi_12 = jnp.expm1(-r2 * h)
            phi_22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
            x_s2 = ((sig_s2 / sig_s) * x - a_s2 * phi_12 * m_s
                    + (r2 / r1) * a_s2 * phi_22 * (m_s1 - m_s))
            m_s2 = mval(x_s2, s2)
            phi_1 = jnp.expm1(-h)
            phi_2 = phi_1 / h + 1.0
            return ((sig_t / sig_s) * x - a_t * phi_1 * m_s
                    + (a_t * phi_2 / r2) * (m_s2 - m_s))
        phi_12 = jnp.expm1(r2 * h)
        phi_22 = jnp.expm1(r2 * h) / (r2 * h) - 1.0
        x_s2 = (jnp.exp(la2 - la_s) * x - sig_s2 * phi_12 * m_s
                - (r2 / r1) * sig_s2 * phi_22 * (m_s1 - m_s))
        m_s2 = mval(x_s2, s2)
        phi_1 = jnp.expm1(h)
        phi_2 = phi_1 / h - 1.0
        return (jnp.exp(la_t - la_s) * x - sig_t * phi_1 * m_s
                - (sig_t * phi_2 / r2) * (m_s2 - m_s))

    def cond(carry):
        x, x_prev, s, h, _ = carry
        return jnp.abs(s - t_0) > t_err

    def body(carry):
        x, x_prev, s, h, nfe = carry
        lam_s = ns.marginal_lambda_jnp(s)
        t = ns.inverse_lambda_jnp(lam_s + h)
        m_s = mval(x, s)
        if order == 2:
            x_lower = first_update(x, s, t, m_s)
            x_higher, _ = second_update(x, s, t, m_s)
        else:
            x_lower, m_s1 = second_update(x, s, t, m_s, r1=1 / 3)
            x_higher = third_update(x, s, t, m_s, m_s1)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_lower),
                                                     jnp.abs(x_prev)))
        err = jnp.sqrt(jnp.mean(
            jnp.square((x_higher - x_lower) / delta)
            .reshape(n, -1), axis=-1)).max()
        accept = err <= 1.0
        x_new = jnp.where(accept, x_higher, x)
        s_new = jnp.where(accept, t, s)
        xp_new = jnp.where(accept, x_lower, x_prev)
        lam_new = ns.marginal_lambda_jnp(s_new)
        h_new = jnp.minimum(
            theta * h * err ** (-1.0 / order), lam_0 - lam_new)
        return (x_new, xp_new, s_new, h_new, nfe + order)

    s0 = jnp.float32(t_T)
    carry = (x, x, s0, jnp.float32(h_init), jnp.int32(0))
    x, _, _, _, _ = jax.lax.while_loop(cond, body, carry)
    return x
