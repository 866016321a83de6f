"""Unit tests for the uniform-affine quantizer core.

Covers the math of the reference's UniformAffineQuantizer + scalers
(/root/reference/quant/quant_layer.py:20-253) as re-specified in
tfmq_dm_tpu/quant/quantizer.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmq_dm_tpu.quant.quantizer import (
    QCfg, fake_quant, quant_int, ste_round, init_qparams, scaler_minmax,
    scaler_mse, scaler_kl, scaler_hist, qparams_from_range,
    ema_range_update, lp_loss_all, broadcast_channel,
)


def test_qcfg_ranges():
    assert QCfg(bits=8, symmetric=False).qrange == (0, 255)
    assert QCfg(bits=8, symmetric=True).qrange == (-128, 127)
    assert QCfg(bits=4, symmetric=False).qrange == (0, 15)
    # always_zero forces the unsigned grid even if symmetric
    assert QCfg(bits=8, symmetric=True, always_zero=True).qrange == (0, 255)


def test_ste_round_grad_is_identity():
    g = jax.grad(lambda x: jnp.sum(ste_round(x) ** 2))(jnp.array([1.3, -0.7]))
    # d/dx (round(x)^2) with STE = 2*round(x)
    np.testing.assert_allclose(g, 2 * np.round([1.3, -0.7]), atol=1e-6)


def test_fake_quant_exact_on_grid():
    """Values already on the quant grid must round-trip exactly."""
    cfg = QCfg(bits=8, symmetric=False)
    delta = jnp.float32(0.1)
    zp = jnp.float32(128.0)
    levels = jnp.arange(-128, 128, dtype=jnp.float32) * 0.1
    out = fake_quant(levels, delta, zp, cfg)
    np.testing.assert_allclose(out, levels, atol=1e-6)


def test_fake_quant_clips():
    cfg = QCfg(bits=8, symmetric=False)
    delta, zp = jnp.float32(0.1), jnp.float32(0.0)
    out = fake_quant(jnp.array([1e9, -1e9], jnp.float32), delta, zp, cfg)
    np.testing.assert_allclose(out, [25.5, 0.0], atol=1e-5)


def test_quant_int_matches_fake_quant():
    cfg = QCfg(bits=8, symmetric=False)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (64,))
    delta, zp = init_qparams(x, cfg, scaler="minmax")
    xi = quant_int(x, delta, zp, cfg, dtype=jnp.int32)
    dq = delta * (xi.astype(jnp.float32) - zp)
    fq = fake_quant(x, delta, zp, cfg)
    np.testing.assert_allclose(dq, fq, atol=1e-6)


def test_minmax_error_bound():
    """Quantization error must be bounded by delta/2 for in-range values."""
    cfg = QCfg(bits=8, symmetric=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (1000,))
    delta, zp = scaler_minmax(x, cfg)
    err = jnp.max(jnp.abs(fake_quant(x, delta, zp, cfg) - x))
    assert err <= float(delta) / 2 + 1e-6


def test_mse_scaler_beats_or_ties_minmax():
    """MSE shrink search (i=0 candidate IS minmax) can only improve L2.4."""
    cfg = QCfg(bits=4, symmetric=False)
    x = jax.random.normal(jax.random.PRNGKey(2), (4096,)) ** 3  # heavy tails
    d_mm, z_mm = scaler_minmax(x, cfg)
    d_ms, z_ms = scaler_mse(x, cfg)

    def score(d, z):
        return float(jnp.mean(jnp.abs(fake_quant(x, d, z, cfg) - x) ** 2.4))

    assert score(d_ms, z_ms) <= score(d_mm, z_mm) + 1e-9


def test_mse_scaler_jittable():
    cfg = QCfg(bits=8)
    f = jax.jit(lambda x: scaler_mse(x, cfg))
    d, z = f(jax.random.normal(jax.random.PRNGKey(3), (256,)))
    assert d.shape == () and z.shape == ()
    assert float(d) > 0


@pytest.mark.parametrize("scaler", ["kl", "hist"])
def test_host_scalers_run(scaler):
    cfg = QCfg(bits=8)
    x = np.random.RandomState(0).randn(2048).astype(np.float32)
    fn = {"kl": scaler_kl, "hist": scaler_hist}[scaler]
    d, z = fn(x, cfg)
    assert float(d) > 0
    # sane reconstruction
    err = float(jnp.mean((fake_quant(jnp.asarray(x), d, z, cfg) - x) ** 2))
    assert err < 0.1


def test_per_channel_init_shapes_and_independence():
    cfg = QCfg(bits=8, channel_wise=True)
    # two channels with very different scales
    w = jnp.stack([jnp.linspace(-1, 1, 32),
                   jnp.linspace(-100, 100, 32)], axis=-1)  # (32, 2)
    delta, zp = init_qparams(w, cfg, scaler="minmax")
    assert delta.shape == (2,)
    assert float(delta[1]) > 50 * float(delta[0])
    # broadcast + fake-quant keeps channels accurate at their own scale
    d = broadcast_channel(delta, w.shape)
    z = broadcast_channel(zp, w.shape)
    out = fake_quant(w, d, z, cfg)
    assert float(jnp.max(jnp.abs(out - w)[:, 0])) < 0.01
    assert float(jnp.max(jnp.abs(out - w)[:, 1])) < 1.0


def test_always_zero_softmax_mode():
    """Softmax outputs live in [0,1]; always_zero pins zp=0 and
    delta=max/(2^b-1) (quant_layer.py:30-34)."""
    cfg = QCfg(bits=8, symmetric=False, always_zero=True)
    x = jax.random.uniform(jax.random.PRNGKey(4), (512,))
    delta, zp = scaler_minmax(x, cfg)
    assert float(zp) == 0.0
    np.testing.assert_allclose(float(delta), float(jnp.max(x)) / 255, rtol=1e-5)
    out = fake_quant(x, delta, zp, cfg)
    assert float(jnp.min(out)) >= 0.0


def test_ema_range_update():
    x = jnp.array([-2.0, 2.0])
    mn, mx = ema_range_update(x, jnp.float32(-1.0), jnp.float32(1.0),
                              momentum=0.95)
    np.testing.assert_allclose(mn, -1.05, atol=1e-6)
    np.testing.assert_allclose(mx, 1.05, atol=1e-6)


def test_qparams_from_range_matches_minmax():
    cfg = QCfg(bits=8)
    x = jax.random.normal(jax.random.PRNGKey(5), (128,))
    d1, z1 = scaler_minmax(x, cfg)
    d2, z2 = qparams_from_range(jnp.min(x), jnp.max(x), cfg)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    np.testing.assert_allclose(z1, z2, rtol=1e-6)


def test_lp_loss():
    a = jnp.ones((4, 8))
    b = jnp.zeros((4, 8))
    assert float(lp_loss_all(a, b, p=2.0)) == 1.0
