"""DDIM / DDPM samplers as single `lax.scan` programs.

Re-specifies ``generalized_steps`` / ``ddpm_steps``
(/root/reference/ddim/functions/denoising.py:10-88) TPU-first:

- the whole rollout is one jitted scan — no host round-trips, no
  ``.cpu()`` shuttling per step;
- the per-step model callback receives the *step index* so FSC
  (per-timestep activation params) is a `dynamic_index` into batched
  arrays instead of the reference's per-step ``load_state_dict``
  (denoising.py:26-29);
- calibration-data harvesting: the scan emits every intermediate model
  input ``(x_t, t)`` in ONE rollout — the reference re-samples from scratch
  for each t (``untill_fake_t`` early exit, data_generate.py:52-72), an
  O(T^2) pattern this design collapses to O(T).

All schedule math is precomputed host-side (numpy) and baked into the scan
as static per-step arrays.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.schedules import compute_alpha_bar

# model_fn(x, t_batch, step_index) -> eps
ModelFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


def _step_tables(betas: np.ndarray, seq: np.ndarray):
    """Per-step (t, at, at_next) in *sampling order* (reversed seq),
    matching denoising.py:14-22: seq_next = [-1]+seq[:-1], iterate reversed.
    """
    ab = compute_alpha_bar(betas)
    seq = np.asarray(seq, dtype=np.int64)
    seq_next = np.concatenate([[-1], seq[:-1]])
    t_arr = seq[::-1].copy()
    tn_arr = seq_next[::-1].copy()
    at = ab[t_arr + 1]
    at_next = ab[tn_arr + 1]
    return (jnp.asarray(t_arr, jnp.int32),
            jnp.asarray(at, jnp.float32),
            jnp.asarray(at_next, jnp.float32))


def generalized_scan(model_fn: ModelFn, betas: np.ndarray, seq: np.ndarray,
                     x: jax.Array, key: Optional[jax.Array] = None,
                     eta: float = 0.0, collect: str = "none"):
    """DDIM (generalized) sampling loop (denoising.py:10-41).

    collect: "none" -> returns final x only;
             "traj" -> also returns (x_in[steps], t[steps]) — the model
                       inputs at every step (calibration harvest);
             "x0"   -> also returns x0 predictions per step.
    ``key`` is required when eta > 0 (stochastic steps).
    """
    t_arr, at_arr, atn_arr = _step_tables(betas, seq)
    nsteps = t_arr.shape[0]
    n = x.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)

    def step(carry, i):
        xt = carry
        t = t_arr[i]
        at = at_arr[i]
        at_next = atn_arr[i]
        t_b = jnp.full((n,), t, jnp.int32)
        et = model_fn(xt, t_b, i)
        x0_t = (xt - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
        c1 = eta * jnp.sqrt((1.0 - at / at_next) * (1.0 - at_next)
                            / (1.0 - at))
        c2 = jnp.sqrt(jnp.maximum((1.0 - at_next) - c1 ** 2, 0.0))
        noise = jax.random.normal(jax.random.fold_in(key, i), xt.shape,
                                  xt.dtype)
        xt_next = jnp.sqrt(at_next) * x0_t + c1 * noise + c2 * et
        if collect == "traj":
            out = (xt, t_b)
        elif collect == "x0":
            out = x0_t
        else:
            out = None
        return xt_next, out

    x_last, ys = jax.lax.scan(step, x, jnp.arange(nsteps))
    if collect == "none":
        return x_last
    return x_last, ys


def ddpm_scan(model_fn: ModelFn, betas: np.ndarray, seq: np.ndarray,
              x: jax.Array, key: jax.Array, collect: str = "none"):
    """DDPM (noisy) sampling loop (denoising.py:44-88), fixedlarge variance
    logvar = log(beta_t) with beta_t = 1 - at/atm1."""
    t_arr, at_arr, atm1_arr = _step_tables(betas, seq)
    nsteps = t_arr.shape[0]
    n = x.shape[0]

    def step(carry, i):
        xt = carry
        t = t_arr[i]
        at = at_arr[i]
        atm1 = atm1_arr[i]
        beta_t = 1.0 - at / atm1
        t_b = jnp.full((n,), t, jnp.int32)
        e = model_fn(xt, t_b, i)
        x0 = jnp.sqrt(1.0 / at) * xt - jnp.sqrt(1.0 / at - 1.0) * e
        x0 = jnp.clip(x0, -1.0, 1.0)
        mean = (jnp.sqrt(atm1) * beta_t * x0
                + jnp.sqrt(1.0 - beta_t) * (1.0 - atm1) * xt) / (1.0 - at)
        noise = jax.random.normal(jax.random.fold_in(key, i), xt.shape,
                                  xt.dtype)
        mask = jnp.where(t == 0, 0.0, 1.0)
        logvar = jnp.log(beta_t)
        xt_next = mean + mask * jnp.exp(0.5 * logvar) * noise
        out = (xt, t_b) if collect == "traj" else None
        return xt_next, out

    x_last, ys = jax.lax.scan(step, x, jnp.arange(nsteps))
    if collect == "none":
        return x_last
    return x_last, ys


def harvest_trajectory(model_fn: ModelFn, betas: np.ndarray,
                       seq: np.ndarray, x0: jax.Array, key: jax.Array,
                       eta: float = 0.0,
                       sample_type: str = "generalized"
                       ) -> Tuple[jax.Array, jax.Array]:
    """Calibration-data harvest: one rollout from noise, returning
    (xs, ts) with xs: (steps, B, H, W, C), ts: (steps, B).

    Index k holds the model input at sampling step k — identical to the
    reference's ``untill_fake_t=k+1`` early-exit harvest
    (data_generate.py:52-72) but computed in a single O(T) scan.
    """
    fn = generalized_scan if sample_type == "generalized" else ddpm_scan
    if sample_type == "generalized":
        _, (xs, ts) = fn(model_fn, betas, seq, x0, key, eta=eta,
                         collect="traj")
    else:
        _, (xs, ts) = fn(model_fn, betas, seq, x0, key, collect="traj")
    return xs, ts
