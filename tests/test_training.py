"""Trainer tests: loss decreases, EMA math, dp-mesh equivalence,
checkpoint round trip, synthetic generator determinism.

Reference counterpart being validated: ddim/runners/diffusion.py:109-201
(antithetic t, 'simple' loss, Adam + clip, EMAHelper 0.9999).

The fast tier drives the (model-agnostic) trainer with a one-conv
eps-predictor so compiles stay in seconds; the real-UNet end-to-end is
the slow tier (and scripts/train_toy.py on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmq_dm_tpu.data.synthetic import blobs_batch
from tfmq_dm_tpu.models import ddim_unet
from tfmq_dm_tpu.parallel.mesh import make_mesh
from tfmq_dm_tpu.pipelines import training
from tfmq_dm_tpu.utils.schedules import get_beta_schedule

RES = 8
BETAS = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                          num_diffusion_timesteps=50)


def _toy_params(key):
    k1, k2 = jax.random.split(key)
    return {"conv": {"w": 0.1 * jax.random.normal(k1, (3, 3, 4, 3)),
                     "b": jnp.zeros((3,))},
            "temb": {"w": 0.1 * jax.random.normal(k2, (1, 4))}}


def _toy_apply(p, x, t):
    """One-conv eps predictor with a broadcast time feature: enough
    structure for the loss to be reducible and t-dependent."""
    tf = jnp.tanh(t.astype(jnp.float32)[:, None] / 50.0 @ p["temb"]["w"])
    h = jnp.concatenate(
        [x, jnp.broadcast_to(tf[:, None, None, :1],
                             x.shape[:3] + (1,))], axis=-1)
    return jax.lax.conv_general_dilated(
        h, p["conv"]["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["conv"]["b"]


def _batch(k, n=8):
    return blobs_batch(k, n, RES, 3)


def test_synthetic_batch_shape_range_determinism():
    k = jax.random.PRNGKey(3)
    a = _batch(k, 4)
    b = _batch(k, 4)
    assert a.shape == (4, RES, RES, 3)
    assert np.all(np.asarray(a) == np.asarray(b))
    assert float(jnp.max(jnp.abs(a))) <= 1.0
    # images are not constant and differ across the batch
    assert float(jnp.std(a)) > 0.05
    assert float(jnp.std(a[0] - a[1])) > 0.01


def test_antithetic_t_pairs():
    t = training.antithetic_t(jax.random.PRNGKey(0), 8, 50)
    t = np.asarray(t)
    assert t.shape == (8,) and t.min() >= 0 and t.max() < 50
    assert np.all(t[:4] + t[4:] == 49)


def test_loss_decreases_toy():
    params = _toy_params(jax.random.PRNGKey(0))
    hp = training.TrainHP(lr=3e-3, steps=200, chunk=50, batch_size=16,
                          ema_rate=0.99)
    _, ema, trace = training.train(_toy_apply, params, BETAS, hp,
                                   jax.random.PRNGKey(1),
                                   lambda k: _batch(k, 16))
    assert trace.shape == (200,)
    assert np.mean(trace[-30:]) < 0.75 * np.mean(trace[:10])
    out = _toy_apply(ema, _batch(jax.random.PRNGKey(2), 2),
                     jnp.array([3, 40]))
    assert out.shape == (2, RES, RES, 3)


def test_ema_single_step_blend():
    params = _toy_params(jax.random.PRNGKey(0))
    hp = training.TrainHP(lr=1e-3, steps=1, chunk=1, batch_size=4,
                          ema_rate=0.9)
    new_p, ema, _ = training.train(_toy_apply, params, BETAS, hp,
                                   jax.random.PRNGKey(1), _batch)
    # after one step from identical start: ema = 0.9*old + 0.1*new
    want = 0.9 * np.asarray(params["conv"]["w"]) + \
        0.1 * np.asarray(new_p["conv"]["w"])
    np.testing.assert_allclose(np.asarray(ema["conv"]["w"]), want,
                               rtol=1e-5, atol=1e-6)


def test_dp_mesh_matches_single_device():
    params = _toy_params(jax.random.PRNGKey(0))
    hp = training.TrainHP(lr=1e-3, steps=10, chunk=5, batch_size=8,
                          ema_rate=0.99)
    _, ema1, tr1 = training.train(_toy_apply, params, BETAS, hp,
                                  jax.random.PRNGKey(1), _batch)
    mesh = make_mesh(dp=8, tp=1)
    _, ema8, tr8 = training.train(_toy_apply, params, BETAS, hp,
                                  jax.random.PRNGKey(1), _batch,
                                  mesh=mesh)
    np.testing.assert_allclose(tr8, tr1, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ema8["conv"]["w"]),
                               np.asarray(ema1["conv"]["w"]),
                               rtol=2e-4, atol=1e-6)


def test_params_npz_round_trip(tmp_path):
    params = ddim_unet.init_params(jax.random.PRNGKey(0),
                                   ddim_unet.tiny_config())
    path = str(tmp_path / "p.npz")
    training.save_params(path, params, meta={"kind": "ddim_unet"})
    loaded, meta = training.load_params(path)
    assert meta["kind"] == "ddim_unet"
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, loaded)


@pytest.mark.slow
def test_unet_train_loss_decreases():
    cfg = ddim_unet.tiny_config()

    def apply_fn(p, x, t):
        return ddim_unet.apply(p, cfg, x, t)

    params = ddim_unet.init_params(jax.random.PRNGKey(0), cfg)
    hp = training.TrainHP(lr=1e-3, steps=60, chunk=20, batch_size=8,
                          ema_rate=0.99)
    _, ema, trace = training.train(
        apply_fn, params, BETAS, hp, jax.random.PRNGKey(1),
        lambda k: blobs_batch(k, 8, cfg.resolution, cfg.in_channels))
    assert np.mean(trace[-20:]) < 0.5 * np.mean(trace[:10])
    out = apply_fn(ema, blobs_batch(jax.random.PRNGKey(2), 2,
                                    cfg.resolution, cfg.in_channels),
                   jnp.array([3, 40]))
    assert out.shape == (2, cfg.resolution, cfg.resolution, 3)
