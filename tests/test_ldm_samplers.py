"""Golden tests for the LDM-family samplers: each scan is checked against
a literal numpy re-derivation of the reference loop math
(ddim.py / plms.py / dpm_solver.py) with a parameter-free toy model."""

import numpy as np
import jax
import jax.numpy as jnp

from tfmq_dm_tpu.samplers import ldm as S


def _toy(x, t, step=None):
    tt = np.asarray(t, np.float32).reshape(-1, 1, 1, 1) / 1000.0
    return np.tanh(x) * (0.4 + tt)


def _toy_jax(x, t, step):
    tt = t.astype(jnp.float32).reshape(-1, 1, 1, 1) / 1000.0
    return jnp.tanh(x) * (0.4 + tt)


def _schedule():
    betas = S.make_beta_schedule("linear", 1000, linear_start=0.0015,
                                 linear_end=0.0195)
    ac = np.cumprod(1 - betas)
    return ac


def test_ddim_timesteps_shift():
    ts = S.make_ddim_timesteps(10, 1000)
    assert ts[0] == 1 and ts[1] == 101  # the +1 shift (util.py:58)


def test_ddim_scan_ldm_matches_numpy():
    ac = _schedule()
    ts = S.make_ddim_timesteps(8, 1000)
    sched = S.DDIMScheduleLDM(ac, ts, eta=0.0)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)

    # numpy reference: p_sample_ddim / get_x_prev_and_pred_x0 math
    alphas = ac[ts]
    alphas_prev = np.concatenate([[ac[0]], ac[ts[:-1]]])
    xt = x.copy()
    for idx in range(len(ts) - 1, -1, -1):
        step_t = ts[idx]
        e_t = _toy(xt, np.full((2,), step_t))
        a_t, a_prev = alphas[idx], alphas_prev[idx]
        pred_x0 = (xt - np.sqrt(1 - a_t) * e_t) / np.sqrt(a_t)
        dir_xt = np.sqrt(1 - a_prev) * e_t
        xt = np.sqrt(a_prev) * pred_x0 + dir_xt

    got = S.ddim_scan_ldm(_toy_jax, sched, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), xt, atol=1e-4, rtol=1e-4)


def test_plms_scan_matches_numpy():
    ac = _schedule()
    ts = S.make_ddim_timesteps(6, 1000)
    sched = S.DDIMScheduleLDM(ac, ts, eta=0.0)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)

    alphas = ac[ts]
    alphas_prev = np.concatenate([[ac[0]], ac[ts[:-1]]])
    time_range = ts[::-1]

    def get_x_prev(e, xt, index):
        a_t, a_prev = alphas[index], alphas_prev[index]
        pred_x0 = (xt - np.sqrt(1 - a_t) * e) / np.sqrt(a_t)
        return np.sqrt(a_prev) * pred_x0 + np.sqrt(1 - a_prev) * e

    # literal re-derivation of the PLMS loop (plms.py:146-240)
    img = x.copy()
    old_eps = []
    total = len(ts)
    for i, step_t in enumerate(time_range):
        index = total - i - 1
        tb = np.full((2,), step_t)
        e_t = _toy(img, tb)
        if len(old_eps) == 0:
            x_prev1 = get_x_prev(e_t, img, index)
            t_next = time_range[min(i + 1, total - 1)]
            e_next = _toy(x_prev1, np.full((2,), t_next))
            e_prime = (e_t + e_next) / 2
        elif len(old_eps) == 1:
            e_prime = (3 * e_t - old_eps[-1]) / 2
        elif len(old_eps) == 2:
            e_prime = (23 * e_t - 16 * old_eps[-1] + 5 * old_eps[-2]) / 12
        else:
            e_prime = (55 * e_t - 59 * old_eps[-1] + 37 * old_eps[-2]
                       - 9 * old_eps[-3]) / 24
        img = get_x_prev(e_prime, img, index)
        old_eps.append(e_t)
        if len(old_eps) >= 4:
            old_eps.pop(0)

    got = S.plms_scan(_toy_jax, sched, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), img, atol=1e-4, rtol=1e-4)


def test_dpm_solver_pp_2m_matches_numpy():
    ac = _schedule()
    steps = 7
    sched = S.DPMSchedule(ac, steps)
    rng = np.random.RandomState(2)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)

    lam, alpha, sigma, mt = sched.lam, sched.alpha, sched.sigma, sched.model_t

    def x0(xt, i):
        eps = _toy(xt, np.full((2,), mt[i]))
        return (xt - sigma[i] * eps) / alpha[i]

    # literal multistep loop (dpm_solver.py:1075-1115)
    m_prev_list = [x0(x, 0)]
    xt = x.copy()
    t_prev = [0]
    for step in range(1, steps + 1):
        order = min(2, step)
        if step == steps:
            order = 1  # lower_order_final
        if order == 1 or len(m_prev_list) < 2:
            h = lam[step] - lam[step - 1]
            xt = (sigma[step] / sigma[step - 1]) * xt \
                - alpha[step] * np.expm1(-h) * m_prev_list[-1]
        else:
            h0 = lam[step - 1] - lam[step - 2]
            h = lam[step] - lam[step - 1]
            r0 = h0 / h
            d1 = (m_prev_list[-1] - m_prev_list[-2]) / r0
            xt = (sigma[step] / sigma[step - 1]) * xt \
                - alpha[step] * np.expm1(-h) * m_prev_list[-1] \
                - 0.5 * alpha[step] * np.expm1(-h) * d1
        if step < steps:
            m_prev_list.append(x0(xt, step))
            if len(m_prev_list) > 2:
                m_prev_list.pop(0)

    got = S.dpm_solver_pp_2m_scan(_toy_jax, sched, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), xt, atol=1e-4, rtol=1e-3)


def test_cfg_wrapper():
    def apply_fn(x, t, c, step):
        return x * 0 + c.mean(axis=(1, 2)).reshape(-1, 1, 1, 1)

    cond = jnp.ones((2, 3, 4))
    uncond = jnp.zeros((2, 3, 4))
    fn = S.make_cfg_model_fn(apply_fn, cond, uncond, scale=7.5)
    e = fn(jnp.zeros((2, 8, 8, 3)), jnp.zeros((2,), jnp.int32), 0)
    np.testing.assert_allclose(np.asarray(e), 7.5, atol=1e-6)


def test_group_of_step_from_t():
    g = S.group_of_step_from_t(np.array([901, 601, 301, 1]),
                               np.array([901, 601, 301, 1]))
    np.testing.assert_array_equal(g, [0, 1, 2, 3])
    g2 = S.group_of_step_from_t(np.array([901, 601, 301, 1]),
                                np.array([801, 401, 1]))
    np.testing.assert_array_equal(g2, [0, 2, 3])


def test_harvest_modes():
    ac = _schedule()
    ts = S.make_ddim_timesteps(5, 1000)
    sched = S.DDIMScheduleLDM(ac, ts)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    _, (xs, tts) = S.ddim_scan_ldm(_toy_jax, sched, x, collect="traj")
    assert xs.shape == (5, 2, 8, 8, 3)
    assert int(tts[0, 0]) == int(sched.t[0])
    _, (xs2, t2) = S.plms_scan(_toy_jax, sched, x, collect="traj")
    assert xs2.shape == (5, 2, 8, 8, 3)
    dsched = S.DPMSchedule(ac, 5)
    _, (xs3, t3) = S.dpm_solver_pp_2m_scan(_toy_jax, dsched, x,
                                           collect="traj")
    assert xs3.shape == (5, 2, 8, 8, 3)


def test_dpm_solver_matches_reference_torch_entry_config():
    """Golden parity with the torch dpm_solver.py at the EXACT entry-flow
    configuration (sampler.py:82-85): NoiseScheduleVP('discrete'),
    model_type='noise', guidance_type='classifier-free' scale 7.5,
    DPM_Solver(predict_x0=True, thresholding=False), steps multistep
    order-2 time_uniform lower_order_final. The torch implementation is
    imported from the read-only reference tree at test time (skipped
    where unavailable). Out-of-scope variants (orders 1/3, singlestep,
    adaptive, thresholding) are documented in docs/COMPONENTS.md row 16.
    """
    import os
    import sys

    import pytest

    torch = pytest.importorskip("torch")
    ref_dir = ("/root/reference/stable-diffusion/ldm/models/diffusion/"
               "dpm_solver")
    if not os.path.isdir(ref_dir):
        pytest.skip("reference tree not available")
    sys.path.insert(0, ref_dir)
    try:
        import dpm_solver as ref
    finally:
        sys.path.pop(0)

    n_t, steps, scale = 1000, 8, 7.5
    betas = S.make_beta_schedule("linear", n_t, linear_start=0.0015,
                                 linear_end=0.0195)
    ac = np.cumprod(1 - betas).astype(np.float32)
    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 8, 8, 3).astype(np.float32)
    cval = rng.randn(2, 1, 1, 1).astype(np.float32)

    def toy_np(x, t, c):
        tt = np.asarray(t, np.float32).reshape(-1, 1, 1, 1) / 1000.0
        return np.tanh(x) * (0.4 + tt) + 0.05 * c

    # ---- torch reference at the entry config ----
    def apply_model(x, t, c):
        return torch.from_numpy(
            toy_np(x.numpy(), t.numpy(), c.numpy()))

    ns = ref.NoiseScheduleVP("discrete",
                             alphas_cumprod=torch.from_numpy(ac))
    model_fn = ref.model_wrapper(
        apply_model, ns, model_type="noise",
        guidance_type="classifier-free",
        condition=torch.from_numpy(cval),
        unconditional_condition=torch.zeros_like(
            torch.from_numpy(cval)),
        guidance_scale=scale)
    solver = ref.DPM_Solver(model_fn, ns, predict_x0=True,
                            thresholding=False)
    with torch.no_grad():
        out = solver.sample(torch.from_numpy(x0), steps=steps,
                            skip_type="time_uniform",
                            method="multistep", order=2,
                            lower_order_final=True)
    ref_x = (out[0] if isinstance(out, tuple) else out).numpy()

    # ---- this repo's scan, CFG applied in model_fn (cli.py shape) ----
    sched = S.DPMSchedule(ac, steps)
    cj = jnp.asarray(cval)

    def model_fn_jax(x, t, step):
        e_uc = jnp.tanh(x) * (0.4 + t.reshape(-1, 1, 1, 1) / 1000.0)
        e_c = e_uc + 0.05 * cj
        return e_uc + scale * (e_c - e_uc)

    got = S.dpm_solver_pp_2m_scan(model_fn_jax, sched, jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(got), ref_x, atol=2e-4,
                               rtol=2e-4)
