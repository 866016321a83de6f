"""Exactness tests: the integer deployment ops must reproduce the
fake-quant reference semantics bit-for-bit (up to fp32 epilogue error):
conv(fq(x), fq(w)) == int8_conv2d(quantized operands).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmq_dm_tpu.ops import int_ops
from tfmq_dm_tpu.ops import nn as fnn
from tfmq_dm_tpu.quant.adaround import adaround_fq, init_alpha
from tfmq_dm_tpu.quant.quantizer import (QCfg, broadcast_channel,
                                         fake_quant, init_qparams)

W_CFG = QCfg(bits=8, symmetric=False, channel_wise=True)
A_CFG = QCfg(bits=8, symmetric=False, channel_wise=False)


def _setup_conv(key=0, b=2, h=8, wdim=8, cin=16, cout=24):
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.normal(kx, (b, h, wdim, cin))
    w = jax.random.normal(kw, (3, 3, cin, cout)) * 0.2
    bias = jax.random.normal(kb, (cout,))
    dw, zw = init_qparams(w, W_CFG, scaler="minmax")
    dx, zx = init_qparams(x, A_CFG, scaler="minmax")
    return x, w, bias, (dw, zw), (dx, zx)


def _fq_ref_conv(x, w, bias, wq, aq, pads="SAME"):
    dw, zw = wq
    dx, zx = aq
    x_dq = fake_quant(x, dx, zx, A_CFG)
    w_dq = fake_quant(w, broadcast_channel(dw, w.shape),
                      broadcast_channel(zw, w.shape), W_CFG)
    return fnn.conv2d(x_dq, w_dq, bias, padding=pads)


def test_int8_conv_matches_fake_quant_same_padding():
    x, w, bias, (dw, zw), (dx, zx) = _setup_conv()
    ref = _fq_ref_conv(x, w, bias, (dw, zw), (dx, zx))
    iw = int_ops.quantize_weight_int(w, dw, zw, W_CFG)
    x_q, zp_xc = int_ops.quantize_act_int8(x, dx, zx, A_CFG)
    out = int_ops.int8_conv2d(x_q, zp_xc, dx, iw, bias,
                              pads=((1, 1), (1, 1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_int8_conv_matches_fake_quant_valid_1x1():
    x, w, bias, _, _ = _setup_conv()
    w = w[:1, :1]  # 1x1
    dw, zw = init_qparams(w, W_CFG, scaler="minmax")
    dx, zx = init_qparams(x, A_CFG, scaler="minmax")
    ref = _fq_ref_conv(x, w, bias, (dw, zw), (dx, zx), pads="VALID")
    iw = int_ops.quantize_weight_int(w, dw, zw, W_CFG)
    x_q, zp_xc = int_ops.quantize_act_int8(x, dx, zx, A_CFG)
    out = int_ops.int8_conv2d(x_q, zp_xc, dx, iw, bias,
                              pads=((0, 0), (0, 0)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_int8_conv_with_adaround_weights():
    x, w, bias, (dw, zw), (dx, zx) = _setup_conv(key=1)
    alpha = init_alpha(w, dw) + 0.3  # shift so some roundings flip
    w_dq = adaround_fq(w, dw, zw, alpha, W_CFG, soft=False)
    x_dq = fake_quant(x, dx, zx, A_CFG)
    ref = fnn.conv2d(x_dq, w_dq, bias, padding="SAME")
    iw = int_ops.quantize_weight_int(w, dw, zw, W_CFG, alpha=alpha)
    x_q, zp_xc = int_ops.quantize_act_int8(x, dx, zx, A_CFG)
    out = int_ops.int8_conv2d(x_q, zp_xc, dx, iw, bias,
                              pads=((1, 1), (1, 1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_int8_linear_matches_fake_quant():
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (32, 64))
    w = jax.random.normal(kw, (64, 48)) * 0.3
    dw, zw = init_qparams(w, W_CFG, scaler="minmax")
    dx, zx = init_qparams(x, A_CFG, scaler="minmax")
    x_dq = fake_quant(x, dx, zx, A_CFG)
    w_dq = fake_quant(w, broadcast_channel(dw, w.shape),
                      broadcast_channel(zw, w.shape), W_CFG)
    ref = fnn.linear(x_dq, w_dq)
    iw = int_ops.quantize_weight_int(w, dw, zw, W_CFG)
    x_q, zp_xc = int_ops.quantize_act_int8(x, dx, zx, A_CFG)
    out = int_ops.int8_linear(x_q, zp_xc, dx, iw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_int4_weight_path():
    cfg4 = QCfg(bits=4, symmetric=False, channel_wise=True)
    kw = jax.random.PRNGKey(3)
    w = jax.random.normal(kw, (64, 48)) * 0.3
    dw, zw = init_qparams(w, cfg4, scaler="minmax")
    iw = int_ops.quantize_weight_int(w, dw, zw, cfg4)
    w_dq_ref = fake_quant(w, broadcast_channel(dw, w.shape),
                          broadcast_channel(zw, w.shape), cfg4)
    np.testing.assert_allclose(np.asarray(int_ops.dequant_weight(iw)),
                               np.asarray(w_dq_ref), atol=1e-5)
    # int4 values occupy 16 levels centered at -8
    vals = np.unique(np.asarray(iw.w_q))
    assert vals.min() >= -8 and vals.max() <= 7


def test_strided_conv():
    x, w, bias, (dw, zw), (dx, zx) = _setup_conv(key=4)
    x_dq = fake_quant(x, dx, zx, A_CFG)
    w_dq = fake_quant(w, broadcast_channel(dw, w.shape),
                      broadcast_channel(zw, w.shape), W_CFG)
    # reference downsample style: pad (0,1),(0,1) + stride-2 VALID
    xp = jnp.pad(x_dq, ((0, 0), (0, 1), (0, 1), (0, 0)))
    ref = fnn.conv2d(xp, w_dq, bias, stride=2, padding="VALID")
    iw = int_ops.quantize_weight_int(w, dw, zw, W_CFG)
    x_q, zp_xc = int_ops.quantize_act_int8(x, dx, zx, A_CFG)
    out = int_ops.int8_conv2d(x_q, zp_xc, dx, iw, bias, stride=2,
                              pads=((0, 1), (0, 1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_int8_conv_symmetric_weights():
    """Symmetric weight grids (zp_w = 0): the deployed conv skips the
    activation-windowed-sum correction yet stays exact vs fake-quant."""
    wcfg = QCfg(bits=8, symmetric=True, channel_wise=True)
    x, w, bias, _, (dx, zx) = _setup_conv(key=3)
    dw, zw = init_qparams(w, wcfg, scaler="minmax")
    x_dq = fake_quant(x, dx, zx, A_CFG)
    w_dq = fake_quant(w, broadcast_channel(dw, w.shape),
                      broadcast_channel(zw, w.shape), wcfg)
    ref = fnn.conv2d(x_dq, w_dq, bias, padding="SAME")
    iw = int_ops.quantize_weight_int(w, dw, zw, wcfg)
    assert iw.sym and int(np.abs(np.asarray(iw.zp_c)).max()) == 0
    x_q, zp_xc = int_ops.quantize_act_int8(x, dx, zx, A_CFG)
    got = int_ops.int8_conv2d(x_q, zp_xc, dx, iw, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-5)


def test_int8_linear_symmetric_weights():
    wcfg = QCfg(bits=8, symmetric=True, channel_wise=True)
    kx, kw = jax.random.split(jax.random.PRNGKey(4))
    x = jax.random.normal(kx, (6, 32))
    w = jax.random.normal(kw, (32, 48)) * 0.3
    dw, zw = init_qparams(w, wcfg, scaler="minmax")
    dx, zx = init_qparams(x, A_CFG, scaler="minmax")
    ref = fnn.linear(fake_quant(x, dx, zx, A_CFG),
                     fake_quant(w, broadcast_channel(dw, w.shape),
                                broadcast_channel(zw, w.shape), wcfg))
    iw = int_ops.quantize_weight_int(w, dw, zw, wcfg)
    x_q, zp_xc = int_ops.quantize_act_int8(x, dx, zx, A_CFG)
    got = int_ops.int8_linear(x_q, zp_xc, dx, iw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-5)
