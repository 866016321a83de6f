"""Pallas kernel numerics (interpret mode on CPU): the fused kernels must
match the XLA integer ops (which are themselves bit-checked against
fake-quant in test_int_ops.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmq_dm_tpu.ops import int_ops, pallas_kernels as pk
from tfmq_dm_tpu.quant.quantizer import QCfg, init_qparams

W8 = QCfg(bits=8, symmetric=False, channel_wise=True)
W4 = QCfg(bits=4, symmetric=False, channel_wise=True)
A8 = QCfg(bits=8, symmetric=False, channel_wise=False)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # run Pallas in interpreter mode on CPU
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


def _mk(m=64, k=128, n=256, key=0):
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.normal(kx, (m, k))
    w = jax.random.normal(kw, (k, n)) * 0.3
    b = jax.random.normal(kb, (n,))
    return x, w, b


def test_int8_matmul_fused_matches_int_ops():
    x, w, b = _mk()
    dw, zw = init_qparams(w, W8, scaler="minmax")
    dx, zx = init_qparams(x, A8, scaler="minmax")
    iw = int_ops.quantize_weight_int(w, dw, zw, W8)
    x_q, zp_xc = int_ops.quantize_act_int8(x, dx, zx, A8)
    ref = int_ops.int8_linear(x_q, zp_xc, dx, iw, b)
    got = pk.int8_matmul_fused(x, iw.w_q, iw.delta, iw.zp_c, iw.wsum,
                               dx, zp_xc, b, block_m=32, block_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)


def test_int8_matmul_fused_odd_shapes():
    x, w, b = _mk(m=33, k=128, n=128, key=1)
    dw, zw = init_qparams(w, W8, scaler="minmax")
    dx, zx = init_qparams(x, A8, scaler="minmax")
    iw = int_ops.quantize_weight_int(w, dw, zw, W8)
    x_q, zp_xc = int_ops.quantize_act_int8(x, dx, zx, A8)
    ref = int_ops.int8_linear(x_q, zp_xc, dx, iw, b)
    got = pk.int8_matmul_fused(x, iw.w_q, iw.delta, iw.zp_c, iw.wsum,
                               dx, zp_xc, b, block_m=32, block_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)


def test_pack_unpack_int4_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randint(-8, 8, (16, 32)).astype(np.int8)
    packed = pk.pack_int4(w, block_n=32)
    assert packed.shape == (16, 16)
    un = np.asarray(pk._unpack_int4(jnp.asarray(packed)))
    np.testing.assert_array_equal(un, w)


def test_int4_matmul_dequant_matches_reference():
    x, w, b = _mk(m=32, k=128, n=128, key=2)
    dw, zw = init_qparams(w, W4, scaler="minmax")
    iw = int_ops.quantize_weight_int(w, dw, zw, W4)
    # bf16 reference on the dequantized weights (kernel computes bf16)
    w_dq = int_ops.dequant_weight(iw)
    ref = x.astype(jnp.bfloat16) @ w_dq.astype(jnp.bfloat16) + b
    packed = pk.pack_int4(np.asarray(iw.w_q), block_n=128)
    got = pk.int4_matmul_dequant(x, packed, iw.delta, iw.zp_c, b,
                                 block_m=32, block_n=128)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref, np.float32),
                               atol=0.15, rtol=0.02)


def test_int8_matmul_pre_matches_int_ops():
    """Pre-quantized variant (fused corrections/dequant epilogue)."""
    x, w, b = _mk(m=96, k=192, n=320, key=2)
    dw, zw = init_qparams(w, W8, scaler="minmax")
    dx, zx = init_qparams(x, A8, scaler="minmax")
    iw = int_ops.quantize_weight_int(w, dw, zw, W8)
    x_q, zp_xc = int_ops.quantize_act_int8(x, dx, zx, A8)
    ref = int_ops.int8_linear(x_q, zp_xc, dx, iw, b)
    xsum = jnp.sum(x_q.astype(jnp.int32), axis=-1,
                   keepdims=True).astype(jnp.float32)
    got = pk.int8_matmul_pre(x_q, xsum, iw.w_q, iw.delta, iw.zp_c,
                             iw.wsum, dx, zp_xc, b, block_m=32,
                             block_n=128, block_k=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)


def test_gn_swish_quant_int8_matches_unfused():
    """Fused GroupNorm(+scale-shift)+SiLU+quantize kernel agrees with
    the XLA chain to <=1 int8 level (reduction-tree reorder)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tfmq_dm_tpu.ops import nn as fnn
    from tfmq_dm_tpu.ops.int_ops import quantize_act_int8
    from tfmq_dm_tpu.ops.pallas_kernels import gn_swish_quant_int8
    from tfmq_dm_tpu.quant.quantizer import QCfg

    cfg = QCfg(bits=8, symmetric=False)
    for (B, H, W, C, eps, sw, use_ss) in [
            (2, 8, 8, 64, 1e-5, True, False),
            (2, 8, 8, 64, 1e-5, True, True),
            (2, 32, 32, 320, 1e-5, True, False),
            (3, 4, 4, 320, 1e-6, False, False)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C))
        gamma = jax.random.normal(jax.random.PRNGKey(1), (C,)) * .1 + 1
        beta = jax.random.normal(jax.random.PRNGKey(2), (C,)) * .1
        delta, zp = jnp.float32(0.02), jnp.float32(117.0)
        ss = None
        y = fnn.group_norm(x, gamma, beta, groups=32, eps=eps)
        if use_ss:
            sc = jax.random.normal(jax.random.PRNGKey(3), (B, C)) * .1
            sh = jax.random.normal(jax.random.PRNGKey(4), (B, C)) * .1
            ss = (sc, sh)
            y = y * (1.0 + sc[:, None, None, :]) + sh[:, None, None, :]
        if sw:
            y = fnn.swish(y)
        ref_q, ref_zc = quantize_act_int8(y, delta, zp, cfg)
        got_q, got_zc = gn_swish_quant_int8(
            x, gamma, beta, delta, zp, cfg, groups=32, eps=eps,
            do_swish=sw, ss=ss, interpret=True)
        diff = np.abs(np.asarray(got_q, np.int32)
                      - np.asarray(ref_q, np.int32))
        assert diff.max() <= 1, (B, H, W, C, diff.max())
        assert (diff > 0).mean() < 1e-4
        assert float(got_zc) == float(ref_zc)


def test_int4_conv2d_dequant_matches_xla():
    """Packed-int4 tap-GEMM conv (interpret) == XLA conv on the same
    bf16-dequantized weights (f32 dequant, one rounding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tfmq_dm_tpu.ops.pallas_kernels import (int4_conv2d_dequant,
                                                pack_int4)

    rng = np.random.RandomState(0)
    B, H, W, Cin, Cout, KH, KW = 2, 8, 8, 16, 24, 3, 3
    npad = 256
    w_q = rng.randint(-8, 8, (KH * KW, Cin, npad)).astype(np.int8)
    w_q[:, :, Cout:] = 0
    delta = np.ones(npad, np.float32)
    delta[:Cout] = rng.rand(Cout).astype(np.float32) * 0.1 + 0.05
    zp_c = np.zeros(npad, np.float32)
    zp_c[:Cout] = rng.randint(-4, 4, Cout)
    packed = jnp.stack([pack_int4(w_q[t], block_n=256)
                        for t in range(KH * KW)])
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    bias = np.zeros(npad, np.float32)
    bias[:Cout] = rng.randn(Cout) * 0.1

    import tfmq_dm_tpu.ops.pallas_kernels as PK
    from unittest import mock
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def icall(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(PK.pl, "pallas_call", icall):
        out = int4_conv2d_dequant(
            jnp.asarray(x), packed, jnp.asarray(delta),
            jnp.asarray(zp_c), KH, KW, bias=jnp.asarray(bias),
            block_n=256)
    out = np.asarray(out)[:, :, :, :Cout]

    wd = (delta[None, None, :] * (w_q.astype(np.float32)
                                  - zp_c[None, None, :]))
    wd = wd.reshape(KH, KW, Cin, npad)[:, :, :, :Cout]
    wd = np.asarray(jnp.asarray(wd).astype(jnp.bfloat16)
                    .astype(jnp.float32))
    ref = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(wd, jnp.bfloat16),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32))
    ref = ref + bias[None, None, None, :Cout]
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    # row-blocked grid (block_h < H -> multiple output-row blocks per
    # image; SD-scale shapes rely on this to fit scoped VMEM)
    with mock.patch.object(PK.pl, "pallas_call", icall):
        out_rb = int4_conv2d_dequant(
            jnp.asarray(x), packed, jnp.asarray(delta),
            jnp.asarray(zp_c), KH, KW, bias=jnp.asarray(bias),
            block_n=256, block_h=4)
    np.testing.assert_allclose(np.asarray(out_rb)[:, :, :, :Cout], ref,
                               atol=2e-5, rtol=2e-5)


def test_int4_conv_plan_gates_sd_scale_shapes():
    """Scoped-VMEM plan: SD's 64x64 640-channel conv cannot host its
    padded image in VMEM (the driver-observed 19.9M > 16M OOM at
    bench_sd's int4-serving variant) -> plan is None and the call takes
    the XLA dequant fallback; the weight-bandwidth-bound low-res
    1280-channel convs keep the tap-GEMM kernel."""
    assert pk._int4_conv_plan(64, 64, 640, 512, 3, 3, 256, 2) is None
    assert pk._int4_conv_plan(64, 64, 960, 640, 3, 3, 256, 2) is None
    bh = pk._int4_conv_plan(16, 16, 1280, 1280, 3, 3, 256, 2)
    assert bh is not None and 16 % bh == 0
    assert pk._int4_conv_plan(32, 32, 128, 256, 3, 3, 256, 4) is not None


def test_int4_conv2d_dequant_fallback_matches_kernel_semantics():
    """When the plan rejects a shape, int4_conv2d_dequant runs an XLA
    conv on the same one-rounding bf16-dequantized weights; forced here
    via a budget monkeypatch on a small shape and compared against the
    interpret-mode tap-GEMM kernel output."""
    from unittest import mock

    from jax.experimental import pallas as pl

    rng = np.random.RandomState(1)
    B, H, W, Cin, Cout, KH, KW = 1, 8, 8, 16, 24, 3, 3
    npad = 256
    w_q = rng.randint(-8, 8, (KH * KW, Cin, npad)).astype(np.int8)
    w_q[:, :, Cout:] = 0
    delta = np.ones(npad, np.float32)
    delta[:Cout] = rng.rand(Cout).astype(np.float32) * 0.1 + 0.05
    zp_c = np.zeros(npad, np.float32)
    zp_c[:Cout] = rng.randint(-4, 4, Cout)
    packed = jnp.stack([pk.pack_int4(w_q[t], block_n=256)
                        for t in range(KH * KW)])
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.bfloat16)
    bias = np.zeros(npad, np.float32)
    bias[:Cout] = rng.randn(Cout) * 0.1

    orig = pl.pallas_call

    def icall(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    args = (x, packed, jnp.asarray(delta), jnp.asarray(zp_c), KH, KW)
    with mock.patch.object(pk.pl, "pallas_call", icall):
        kout = np.asarray(pk.int4_conv2d_dequant(
            *args, bias=jnp.asarray(bias), block_n=256))[..., :Cout]
    with mock.patch.object(pk, "_INT4_CONV_VMEM_BUDGET", 0):
        fout = np.asarray(pk.int4_conv2d_dequant(
            *args, bias=jnp.asarray(bias), block_n=256))[..., :Cout]
    # same weights after one bf16 rounding; accumulation order differs
    np.testing.assert_allclose(fout, kout, atol=5e-2, rtol=5e-3)
