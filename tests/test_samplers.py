"""Sampler tests: golden parity of the DDIM/DDPM scan vs the reference
loop math (re-derived in numpy from denoising.py:10-88), plus the O(T)
trajectory-harvest equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from tfmq_dm_tpu.samplers import ddim as sampler
from tfmq_dm_tpu.utils.schedules import (get_beta_schedule, skip_seq,
                                         compute_alpha_bar)


def _numpy_generalized(x, seq, betas, model, eta=0.0):
    """Literal numpy re-derivation of generalized_steps (denoising.py:10-41)
    with eta=0 (deterministic)."""
    ab = compute_alpha_bar(betas)
    seq_next = [-1] + list(seq[:-1])
    xs = [x]
    for i, j in zip(reversed(seq), reversed(seq_next)):
        at = ab[i + 1]
        at_next = ab[j + 1]
        xt = xs[-1]
        t = np.full((x.shape[0],), i)
        et = model(xt, t)
        x0_t = (xt - et * np.sqrt(1 - at)) / np.sqrt(at)
        c2 = np.sqrt(1 - at_next)
        xt_next = np.sqrt(at_next) * x0_t + c2 * et
        xs.append(xt_next)
    return xs


def _toy_model(x, t):
    """A nonlinear, t-dependent 'eps model' with no parameters."""
    tt = np.asarray(t, np.float32).reshape(-1, 1, 1, 1) / 1000.0
    return np.tanh(x) * (0.5 + tt)


def _toy_model_jax(x, t, step):
    tt = t.astype(jnp.float32).reshape(-1, 1, 1, 1) / 1000.0
    return jnp.tanh(x) * (0.5 + tt)


def test_generalized_scan_matches_reference_math():
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=1000)
    seq = skip_seq("quad", 1000, 10)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)

    ref_xs = _numpy_generalized(x.copy(), list(seq), betas, _toy_model)
    out = sampler.generalized_scan(_toy_model_jax, betas, seq,
                                   jnp.asarray(x), eta=0.0)
    np.testing.assert_allclose(np.asarray(out), ref_xs[-1], atol=1e-4,
                               rtol=1e-4)


def test_harvest_matches_stepwise_inputs():
    """Trajectory harvest index k == model input at step k (the reference's
    untill_fake_t=k+1 early-exit xt, denoising.py:24-25)."""
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=100)
    seq = skip_seq("uniform", 100, 5)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)

    xs, ts = sampler.harvest_trajectory(_toy_model_jax, betas, seq,
                                        jnp.asarray(x),
                                        jax.random.PRNGKey(0), eta=0.0)
    assert xs.shape == (5, 2, 8, 8, 3)
    assert ts.shape == (5, 2)
    # step 0 input is the initial noise
    np.testing.assert_allclose(np.asarray(xs[0]), x, atol=1e-6)
    # t values descend along the reversed seq
    np.testing.assert_array_equal(np.asarray(ts[:, 0]), list(reversed(seq)))
    # step k input equals the reference's partial rollout
    ref_xs = _numpy_generalized(x.copy(), list(seq), betas, _toy_model)
    for k in range(5):
        np.testing.assert_allclose(np.asarray(xs[k]), ref_xs[k], atol=1e-4,
                                   rtol=1e-4)


def test_ddpm_scan_runs_and_is_finite():
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=100)
    seq = skip_seq("uniform", 100, 10)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3))
    out = sampler.ddpm_scan(_toy_model_jax, betas, seq, x,
                            jax.random.PRNGKey(3))
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_eta_noise_is_reproducible():
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=100)
    seq = skip_seq("uniform", 100, 5)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 3))
    a = sampler.generalized_scan(_toy_model_jax, betas, seq, x,
                                 key=jax.random.PRNGKey(7), eta=1.0)
    b = sampler.generalized_scan(_toy_model_jax, betas, seq, x,
                                 key=jax.random.PRNGKey(7), eta=1.0)
    c = sampler.generalized_scan(_toy_model_jax, betas, seq, x,
                                 key=jax.random.PRNGKey(8), eta=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
