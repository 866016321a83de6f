"""Unit tests for AdaRound (tfmq_dm_tpu/quant/adaround.py), re-specifying
/root/reference/quant/adaptive_rounding.py:12-74 and the temperature decay
of reconstruction_util.py:176-198."""

import jax
import jax.numpy as jnp
import numpy as np

from tfmq_dm_tpu.quant.adaround import (
    init_alpha, soft_targets, adaround_fq, round_regularizer,
    linear_temp_decay, GAMMA, ZETA,
)
from tfmq_dm_tpu.quant.quantizer import QCfg, init_qparams, fake_quant


def _setup(key=0, shape=(16, 8), bits=4):
    cfg = QCfg(bits=bits, symmetric=False, channel_wise=True)
    w = jax.random.normal(jax.random.PRNGKey(key), shape)
    delta, zp = init_qparams(w, cfg, scaler="mse")
    return w, delta, zp, cfg


def test_init_alpha_recovers_fractional_part():
    """h(init_alpha(w)) must equal frac(w/delta) (adaptive_rounding.py:31-38),
    so soft AdaRound at init reproduces the real-valued w/delta."""
    w, delta, zp, cfg = _setup()
    alpha = init_alpha(w, delta)
    h = soft_targets(alpha)
    d = delta.reshape(1, -1)
    rest = w / d - jnp.floor(w / d)
    np.testing.assert_allclose(h, jnp.clip(rest, 1e-4, 1 - 1e-4), atol=1e-3)


def test_soft_at_init_close_to_identity_quant():
    """With alpha at init, soft AdaRound dequant ~= clamp(w) (no rounding
    error at all inside the clip range)."""
    w, delta, zp, cfg = _setup()
    alpha = init_alpha(w, delta)
    out = adaround_fq(w, delta, zp, alpha, cfg, soft=True)
    # inside clip range the soft reconstruction is exact up to clamp
    d = delta.reshape(1, -1)
    inside = (jnp.round(w / d) + zp.reshape(1, -1) > 0) & \
             (jnp.round(w / d) + zp.reshape(1, -1) < cfg.level - 1)
    np.testing.assert_allclose(jnp.where(inside, out, w),
                               jnp.where(inside, w, w), atol=1e-3)


def test_hard_matches_nearest_when_alpha_from_init():
    """Hard rounding with alpha>=0 iff frac>=0.5-ish approximates nearest
    rounding: check exact agreement away from the .5 boundary."""
    w, delta, zp, cfg = _setup(key=1)
    alpha = init_alpha(w, delta)
    hard = adaround_fq(w, delta, zp, alpha, cfg, soft=False)
    nearest = fake_quant(w, delta.reshape(1, -1), zp.reshape(1, -1), cfg)
    d = delta.reshape(1, -1)
    frac = w / d - jnp.floor(w / d)
    # h(alpha) >= 0.5 <=> sigmoid(alpha)*1.2-0.1 >= 0.5 <=> frac >= 0.5
    away = jnp.abs(frac - 0.5) > 0.05
    np.testing.assert_allclose(jnp.where(away, hard, 0),
                               jnp.where(away, nearest, 0), atol=1e-5)


def test_round_regularizer_limits():
    # h in {0,1} -> reg 0 ; h = 0.5 -> reg = count
    a_binary = jnp.array([100.0, -100.0])
    assert float(round_regularizer(a_binary, jnp.float32(2.0))) < 1e-6
    # alpha s.t. h=0.5: sigmoid(a)*(zeta-gamma)+gamma = .5
    a_half = float(np.log((0.5 - GAMMA) / (ZETA - 0.5)))
    reg = round_regularizer(jnp.array([a_half] * 4), jnp.float32(2.0))
    np.testing.assert_allclose(reg, 4.0, atol=1e-5)


def test_linear_temp_decay():
    # warmup region: constant start_b
    assert float(linear_temp_decay(jnp.float32(0), 100, 0.2)) == 20.0
    assert float(linear_temp_decay(jnp.float32(19), 100, 0.2)) == 20.0
    # end: end_b
    np.testing.assert_allclose(
        float(linear_temp_decay(jnp.float32(100), 100, 0.2)), 2.0, atol=1e-5)
    # midpoint of decay
    np.testing.assert_allclose(
        float(linear_temp_decay(jnp.float32(60), 100, 0.2)),
        2.0 + 18.0 * 0.5, atol=1e-4)


def test_adaround_gradients_flow_in_soft_mode():
    w, delta, zp, cfg = _setup(key=2)
    alpha = init_alpha(w, delta)

    def loss(a):
        out = adaround_fq(w, delta, zp, a, cfg, soft=True)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(alpha)
    assert float(jnp.sum(jnp.abs(g))) > 0.0
