"""Flash-attention kernels vs the materialized einsum reference.

Run in Pallas interpreter mode (CPU); on TPU the same kernels compile to
Mosaic. Shapes cover the model zoo: SD self-attn (T=4096 is shrunk to
256 here, head dims 40/80 exercise D-padding), SD cross-attn (Tk=77),
and the DDIM single-head big-D block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmq_dm_tpu.ops import attention as attn_ops
from tfmq_dm_tpu.ops.flash_attention import flash_attention
from tfmq_dm_tpu.quant.quantizer import QCfg, fake_quant


def _ref(q, k, v, sm_scale, p_quant=None, cfg=None):
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=jnp.float32) * sm_scale
    p = jax.nn.softmax(sim, axis=-1)
    if p_quant is not None:
        p = fake_quant(p, p_quant[0], p_quant[1], cfg)
    return jnp.einsum("bhij,bhjd->bhid", p,
                      v.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("tq,tk,h,d", [
    (256, 256, 8, 40),    # SD self-attn head-dim (D padded 40->128)
    (256, 77, 8, 80),     # SD cross-attn vs CLIP context
    (100, 100, 2, 64),    # ragged T (padding + masking)
    (256, 256, 1, 512),   # DDIM single-head block
])
def test_flash_matches_einsum_fp(tq, tk, h, d):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _rand(k1, 2, h, tq, d)
    k = _rand(k2, 2, h, tk, d)
    v = _rand(k3, 2, h, tk, d)
    sm = d ** -0.5
    out = flash_attention(q, k, v, sm_scale=sm, interpret=True)
    ref = _ref(q, k, v, sm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("tq,tk,h,d", [
    (256, 256, 4, 40),
    (130, 77, 8, 64),
])
def test_flash_quantized_softmax_matches_fake_quant(tq, tk, h, d):
    """Two-pass kernel == softmax -> fake_quant(always_zero a8) -> @v."""
    cfg = QCfg(bits=8, symmetric=False, always_zero=True)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    q = _rand(k1, 1, h, tq, d)
    k = _rand(k2, 1, h, tk, d)
    v = _rand(k3, 1, h, tk, d)
    sm = d ** -0.5
    delta = jnp.float32(1.0 / 255.0)   # always_zero: delta = max/(2^b-1)
    zp = jnp.float32(0.0)
    out = flash_attention(q, k, v, sm_scale=sm, p_quant=(delta, zp),
                          qrange=cfg.qrange, interpret=True)
    ref = _ref(q, k, v, sm, p_quant=(delta, zp), cfg=cfg)
    _assert_quant_close(out, ref, delta)


def _assert_quant_close(out, ref, delta):
    """Round-to-nearest boundary cases may flip by one quantization level
    between the two implementations (the online denominator differs in
    the last float bits); require near-exact agreement except for a tiny
    fraction of one-level flips."""
    d = np.abs(np.asarray(out) - np.asarray(ref))
    assert np.mean(d > 1e-5) < 0.005, f"{np.mean(d > 1e-5):.4%} mismatch"
    assert d.max() <= float(delta) * 6.0, d.max()


def test_flash_quantized_asymmetric_zp():
    """Nonzero zero-point path (plain asymmetric aqtizer_w)."""
    cfg = QCfg(bits=8, symmetric=False)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    q = _rand(k1, 1, 2, 128, 64)
    k = _rand(k2, 1, 2, 128, 64)
    v = _rand(k3, 1, 2, 128, 64)
    delta = jnp.float32(0.004)
    zp = jnp.float32(3.0)
    out = flash_attention(q, k, v, sm_scale=0.125, p_quant=(delta, zp),
                          qrange=cfg.qrange, interpret=True)
    ref = _ref(q, k, v, 0.125, p_quant=(delta, zp), cfg=cfg)
    _assert_quant_close(out, ref, delta)


@pytest.mark.parametrize("tq,tk,h,d,with_w", [
    (256, 256, 4, 40, True),
    (256, 256, 4, 40, False),
    (130, 130, 2, 64, True),
])
def test_flash_int8_matches_fake_quant_reference(tq, tk, h, d, with_w):
    """Full deployment kernel (int8 QK + int8 PV + in-kernel act quant)
    == fake_quant(q)/fake_quant(k) -> softmax -> [fake_quant] ->
    @ fake_quant(v)."""
    acfg = QCfg(bits=8, symmetric=False)
    wcfg = QCfg(bits=8, symmetric=False, always_zero=True)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    q = _rand(k1, 1, h, tq, d)
    k = _rand(k2, 1, h, tk, d)
    v = _rand(k3, 1, h, tk, d)
    sm = d ** -0.5
    dq, zq = jnp.float32(0.031), jnp.float32(130.0)
    dk, zk = jnp.float32(0.029), jnp.float32(120.0)
    dv, zv = jnp.float32(0.033), jnp.float32(125.0)
    dw, zw = jnp.float32(1.0 / 255.0), jnp.float32(0.0)

    q_fq = fake_quant(q, dq, zq, acfg)
    k_fq = fake_quant(k, dk, zk, acfg)
    v_fq = fake_quant(v, dv, zv, acfg)
    ref = _ref(q_fq, k_fq, v_fq, sm,
               p_quant=(dw, zw) if with_w else None, cfg=wcfg)

    out = flash_attention(
        q, k, v, sm_scale=sm,
        qkv_quant=((dq, zq), (dk, zk), (dv, zv)),
        qkv_ranges=(acfg.qrange,) * 3,
        p_quant=(dw, zw) if with_w else None,
        qrange=wcfg.qrange if with_w else None, interpret=True)
    if with_w:
        _assert_quant_close(out, ref, dw)
    else:
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)


def test_dispatch_falls_back_on_cpu():
    """qsm_attention must use the einsum path on CPU (auto mode) and give
    the exact reference result including the softmax-output qact."""
    assert jax.default_backend() == "cpu"
    assert not attn_ops._flash_ok(None)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    q = _rand(k1, 2, 64, 2, 32)   # (B, T, H, D) caller layout
    k = _rand(k2, 2, 64, 2, 32)
    v = _rand(k3, 2, 64, 2, 32)
    out = attn_ops.qsm_attention(q, k, v, 32 ** -0.5, None, {})
    ref = _ref(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
               v.transpose(0, 2, 1, 3), 32 ** -0.5).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_dispatch_flash_matches_einsum_when_forced():
    """set_flash("on") routes through the kernel (interpreted via the
    CPU-lowered pallas_call) and agrees with the fallback."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    q = _rand(k1, 1, 130, 2, 40)
    k = _rand(k2, 1, 130, 2, 40)
    v = _rand(k3, 1, 130, 2, 40)
    ref = attn_ops.qsm_attention(q, k, v, 40 ** -0.5, None, {})
    attn_ops.set_flash("on")
    try:
        out = attn_ops.qsm_attention(q, k, v, 40 ** -0.5, None, {})
    finally:
        attn_ops.set_flash("auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("with_w", [True, False])
def test_int8_materialized_matches_fake_quant_reference(with_w):
    """Deployed small-T attention (ops/attention._int8_materialized):
    int8 einsums + zero-point algebra == fake-quant q/k/v -> softmax ->
    [fake-quant w] -> @ fake-quant v."""
    acfg = QCfg(bits=8, symmetric=False)
    wcfg = QCfg(bits=8, symmetric=False, always_zero=True)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
    b, t, h, d = 2, 64, 2, 48
    q = _rand(k1, b, t, h, d)   # (B, T, H, D) caller layout
    k = _rand(k2, b, t, h, d)
    v = _rand(k3, b, t, h, d)
    sm = d ** -0.5
    dq, zq = jnp.float32(0.031), jnp.float32(130.0)
    dk, zk = jnp.float32(0.029), jnp.float32(120.0)
    dv, zv = jnp.float32(0.033), jnp.float32(125.0)
    dw, zw = jnp.float32(1.0 / 255.0), jnp.float32(0.0)

    q_fq = fake_quant(q, dq, zq, acfg)
    k_fq = fake_quant(k, dk, zk, acfg)
    v_fq = fake_quant(v, dv, zv, acfg)
    ref = _ref(q_fq.transpose(0, 2, 1, 3), k_fq.transpose(0, 2, 1, 3),
               v_fq.transpose(0, 2, 1, 3), sm,
               p_quant=(dw, zw) if with_w else None,
               cfg=wcfg).transpose(0, 2, 1, 3)

    pq = (acfg, {"delta": dq, "zp": zq})
    pk = (acfg, {"delta": dk, "zp": zk})
    pv = (acfg, {"delta": dv, "zp": zv})
    pw = (wcfg, {"delta": dw, "zp": zw}) if with_w else None
    out = attn_ops._int8_materialized(q, k, v, sm, pq, pk, pv, pw,
                                      jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fast_mode_skips_int8_materialized(monkeypatch):
    """bf16-carrier (fast) deployments route small-T attention through
    the XLA fake-quant materialized path (2x faster at CIFAR shapes);
    exact f32 deployments keep _int8_materialized. Both agree to act-
    quant tolerance."""
    from tfmq_dm_tpu.quant.context import QuantCtx
    from tfmq_dm_tpu.quant.policy import LayerPolicy, QuantPolicy

    acfg = QCfg(bits=8, symmetric=False)
    pol = QuantPolicy({s: LayerPolicy(w_cfg=None, a_cfg=acfg, wq=False,
                                      aq=True) for s in ("q", "k", "v")},
                      order=[])
    ast = {s: {"delta": jnp.float32(0.03), "zp": jnp.float32(128.0)}
           for s in ("q", "k", "v")}
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    q = _rand(k1, 2, 64, 1, 32)
    k = _rand(k2, 2, 64, 1, 32)
    v = _rand(k3, 2, 64, 1, 32)
    sites = {"q": "q", "k": "k", "v": "v"}
    calls = []
    orig = attn_ops._int8_materialized

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(attn_ops, "_int8_materialized", spy)

    def ctx(dtype):
        c = QuantCtx(pol, astate=ast, use_aq=True, deploy={"dummy": None},
                     act_out_dtype=dtype)
        return c

    exact = attn_ops.qsm_attention(q, k, v, 32 ** -0.5, ctx(None), sites)
    assert len(calls) == 1
    fast = attn_ops.qsm_attention(q, k, v, 32 ** -0.5,
                                  ctx(jnp.bfloat16), sites)
    assert len(calls) == 1   # fast mode did NOT take the int8 path
    np.testing.assert_allclose(np.asarray(fast).astype(np.float32),
                               np.asarray(exact), atol=0.05, rtol=0.05)


@pytest.mark.parametrize("with_w", [True, False])
def test_fqk_kernel_matches_xla_fake_quant(with_w):
    """The fast-deploy kernel (in-kernel fq on load, bf16 matmuls) must
    agree with XLA fake_quant of q/k/v + the pquant/fp kernel."""
    from tfmq_dm_tpu.quant.quantizer import fake_quant

    acfg = QCfg(bits=8, symmetric=False)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    q = _rand(k1, 2, 2, 140, 48).astype(jnp.bfloat16)
    k = _rand(k2, 2, 2, 140, 48).astype(jnp.bfloat16)
    v = _rand(k3, 2, 2, 140, 48).astype(jnp.bfloat16)
    dq = jnp.float32(0.021); zq = jnp.float32(121.0)
    dk = jnp.float32(0.017); zk = jnp.float32(133.0)
    dv = jnp.float32(0.024); zv = jnp.float32(125.0)
    dw = jnp.float32(1 / 251.); zw = jnp.float32(0.0)
    pq = (dw, zw) if with_w else None
    got = flash_attention(q, k, v, sm_scale=48 ** -0.5,
                          qkv_quant=((dq, zq), (dk, zk), (dv, zv)),
                          qkv_ranges=(acfg.qrange,) * 3,
                          p_quant=pq, int8_matmul=False, interpret=True)
    qf = fake_quant(q, dq, zq, acfg)
    kf = fake_quant(k, dk, zk, acfg)
    vf = fake_quant(v, dv, zv, acfg)
    ref = flash_attention(qf, kf, vf, sm_scale=48 ** -0.5, p_quant=pq,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got).astype(np.float32),
                               np.asarray(ref).astype(np.float32),
                               atol=5e-3, rtol=5e-3)


def test_fast_attn_xla_fq_dispatch_matches_fqk():
    """set_fast_attn("xla_fq") moves the fast-deploy q/k/v fake-quant
    out of the kernel (XLA sweeps, fusable into projection epilogues)
    and runs the pquant-only kernel; the dispatch must agree with the
    default in-kernel fqk mode."""
    from tfmq_dm_tpu.quant.context import QuantCtx
    from tfmq_dm_tpu.quant.policy import LayerPolicy, QuantPolicy

    acfg = QCfg(bits=8, symmetric=False)
    wcfg = QCfg(bits=8, symmetric=False, always_zero=True)
    pol = QuantPolicy(
        {s: LayerPolicy(w_cfg=None, a_cfg=acfg, wq=False, aq=True)
         for s in ("q", "k", "v")} |
        {"w": LayerPolicy(w_cfg=None, a_cfg=wcfg, wq=False, aq=True)},
        order=[])
    ast = {s: {"delta": jnp.float32(0.03), "zp": jnp.float32(126.0)}
           for s in ("q", "k", "v")}
    ast["w"] = {"delta": jnp.float32(1 / 255.), "zp": jnp.float32(0.0)}
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(21), 3)
    q = _rand(k1, 1, 140, 2, 40).astype(jnp.bfloat16)
    k = _rand(k2, 1, 140, 2, 40).astype(jnp.bfloat16)
    v = _rand(k3, 1, 140, 2, 40).astype(jnp.bfloat16)
    sites = {"q": "q", "k": "k", "v": "v", "w": "w"}
    ctx = QuantCtx(pol, astate=ast, use_aq=True, deploy={"dummy": None},
                   act_out_dtype=jnp.bfloat16, flash=True)
    attn_ops.set_flash("on")
    try:
        fqk = attn_ops.qsm_attention(q, k, v, 40 ** -0.5, ctx, sites)
        attn_ops.set_fast_attn("xla_fq")
        xla = attn_ops.qsm_attention(q, k, v, 40 ** -0.5, ctx, sites)
    finally:
        attn_ops.set_fast_attn("fqk")
        attn_ops.set_flash("auto")
    np.testing.assert_allclose(np.asarray(xla).astype(np.float32),
                               np.asarray(fqk).astype(np.float32),
                               atol=5e-3, rtol=5e-3)


def test_fqk_multi_qblock_scratch_persistence():
    """The fqk kernel fake-quants k/v into persistent VMEM scratch only
    on the FIRST q-block of each (b, h) row (@pl.when(program_id(1)==0));
    production SD shapes run many q-blocks per row. tq=300 with
    block_q=128 forces 3 q-blocks so the cross-cell scratch reuse is
    exercised in interpret mode."""
    from tfmq_dm_tpu.quant.quantizer import fake_quant

    acfg = QCfg(bits=8, symmetric=False)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
    q = _rand(k1, 1, 2, 300, 48).astype(jnp.bfloat16)
    k = _rand(k2, 1, 2, 300, 48).astype(jnp.bfloat16)
    v = _rand(k3, 1, 2, 300, 48).astype(jnp.bfloat16)
    dq = jnp.float32(0.021); zq = jnp.float32(121.0)
    dk = jnp.float32(0.017); zk = jnp.float32(133.0)
    dv = jnp.float32(0.024); zv = jnp.float32(125.0)
    got = flash_attention(q, k, v, sm_scale=48 ** -0.5,
                          qkv_quant=((dq, zq), (dk, zk), (dv, zv)),
                          qkv_ranges=(acfg.qrange,) * 3,
                          p_quant=(jnp.float32(1 / 251.),
                                   jnp.float32(0.0)),
                          int8_matmul=False, block_q=128, block_k=128,
                          interpret=True)
    qf = fake_quant(q, dq, zq, acfg)
    kf = fake_quant(k, dk, zk, acfg)
    vf = fake_quant(v, dv, zv, acfg)
    ref = flash_attention(qf, kf, vf, sm_scale=48 ** -0.5,
                          p_quant=(jnp.float32(1 / 251.),
                                   jnp.float32(0.0)), interpret=True)
    np.testing.assert_allclose(np.asarray(got).astype(np.float32),
                               np.asarray(ref).astype(np.float32),
                               atol=5e-3, rtol=5e-3)


@pytest.mark.parametrize("tq", [256, 1100])
def test_wide_softmax_bits_avoid_int8_paths(tq):
    """--softmax_a_bit 16 codes don't fit int8 after 128-centering; the
    dispatch must route around _int8_materialized / _int8_kernel and
    still produce the exact fake-quant semantics (the round-1 advisor
    reproduced ~100% rel. error here)."""
    from tfmq_dm_tpu.quant.context import QuantCtx
    from tfmq_dm_tpu.quant.policy import LayerPolicy, QuantPolicy

    acfg = QCfg(bits=8, symmetric=False)
    wcfg = QCfg(bits=16, symmetric=False, always_zero=True)
    pol = QuantPolicy(
        {s: LayerPolicy(w_cfg=None, a_cfg=acfg, wq=False, aq=True)
         for s in ("q", "k", "v")} |
        {"w": LayerPolicy(w_cfg=None, a_cfg=wcfg, wq=False, aq=True)},
        order=[])
    ast = {s: {"delta": jnp.float32(0.03), "zp": jnp.float32(128.0)}
           for s in ("q", "k", "v")}
    ast["w"] = {"delta": jnp.float32(1.0 / 65535.0),
                "zp": jnp.float32(0.0)}
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(13), 3)
    q = _rand(k1, 1, tq, 2, 48)
    k = _rand(k2, 1, tq, 2, 48)
    v = _rand(k3, 1, tq, 2, 48)
    sites = {"q": "q", "k": "k", "v": "v", "w": "w"}
    ctx = QuantCtx(pol, astate=ast, use_aq=True, deploy={"dummy": None},
                   flash=True)
    got = attn_ops.qsm_attention(q, k, v, 48 ** -0.5, ctx, sites)
    # reference: explicit fake-quant at every site, materialized softmax
    wide = QCfg(bits=16, symmetric=False, always_zero=True)
    qf = fake_quant(q, ast["q"]["delta"], ast["q"]["zp"], acfg)
    kf = fake_quant(k, ast["k"]["delta"], ast["k"]["zp"], acfg)
    vf = fake_quant(v, ast["v"]["delta"], ast["v"]["zp"], acfg)
    sim = jnp.einsum("bihd,bjhd->bhij", qf, kf,
                     preferred_element_type=jnp.float32) * 48 ** -0.5
    p = fake_quant(jax.nn.softmax(sim, axis=-1),
                   ast["w"]["delta"], ast["w"]["zp"], wide)
    ref = jnp.einsum("bhij,bjhd->bihd", p, vf,
                     preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)


def test_fqk_int8_pv_matches_bf16_pv():
    """The int8-PV variant (softmax levels x centered-int8 v codes with
    exact rank-1 corrections) must agree with the default bf16-PV fqk
    kernel. Measured SLOWER on chip at SD shapes (8.3 vs 5.3 ms/call at
    4096 tokens — the N=40 output wastes the int8 MXU rate while the
    psum/cast corrections add full-width VPU work; docs/PERF.md), so it
    defaults off; the exactness contract is pinned here."""
    from tfmq_dm_tpu.quant.quantizer import fake_quant

    acfg = QCfg(bits=8, symmetric=False)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
    q = _rand(k1, 2, 2, 300, 48).astype(jnp.bfloat16)
    k = _rand(k2, 2, 2, 300, 48).astype(jnp.bfloat16)
    v = _rand(k3, 2, 2, 300, 48).astype(jnp.bfloat16)
    dq = jnp.float32(0.021); zq = jnp.float32(121.0)
    dk = jnp.float32(0.017); zk = jnp.float32(133.0)
    dv = jnp.float32(0.024); zv = jnp.float32(125.0)
    dw = jnp.float32(1 / 251.); zw = jnp.float32(0.0)
    kw = dict(sm_scale=48 ** -0.5,
              qkv_quant=((dq, zq), (dk, zk), (dv, zv)),
              qkv_ranges=(acfg.qrange,) * 3, p_quant=(dw, zw),
              p_always_zero=True, int8_matmul=False,
              block_q=128, block_k=128, interpret=True)
    got = flash_attention(q, k, v, int8_pv=True, **kw)
    ref = flash_attention(q, k, v, int8_pv=False, **kw)
    np.testing.assert_allclose(np.asarray(got).astype(np.float32),
                               np.asarray(ref).astype(np.float32),
                               atol=5e-3, rtol=5e-3)
    # the integer PV is if anything closer to the f32 sim: also check
    # against XLA fake-quant + exact softmax-quant reference
    qf = fake_quant(q, dq, zq, acfg)
    kf = fake_quant(k, dk, zk, acfg)
    vf = fake_quant(v, dv, zv, acfg)
    ref2 = flash_attention(qf, kf, vf, sm_scale=48 ** -0.5,
                           p_quant=(dw, zw), p_always_zero=True,
                           block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got).astype(np.float32),
                               np.asarray(ref2).astype(np.float32),
                               atol=5e-3, rtol=5e-3)
