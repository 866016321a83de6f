"""Microbench: attention kernel variants at SD shapes.

  bf16_flash   one-pass online-softmax kernel
  pquant       flash + softmax-output quant epilogue (score scratch)
  int8         full int8 kernel (prequantized operands + corrections)
  fq+pquant    XLA fake-quant of q/k/v + pquant flash
  einsum       materialized bf16 einsum (XLA)
  einsum_i8    materialized int8 einsum path (_int8_materialized)

Usage: python scripts/micro_attn.py [sd1|sd2|xattn|cifar]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tfmq_dm_tpu.ops import attention as attn_ops
from tfmq_dm_tpu.ops.flash_attention import flash_attention
from tfmq_dm_tpu.quant.quantizer import QCfg, fake_quant

N_SHORT, N_LONG, REPS = 20, 120, 3   # bumped for small shapes in main()
# (B, H, Tq, Tk, D)
SHAPES = {
    "sd1": (8, 8, 4096, 4096, 40),
    "sd2": (8, 8, 1024, 1024, 80),
    "xattn": (8, 8, 4096, 77, 40),
    "cifar": (64, 1, 256, 256, 256),
}


def time_chain(fn, q, k, v):
    def chain(n):
        def run(q, k, v):
            def body(i, qq):
                # salt defeats CSE; scalar-sum output keeps the host
                # fetch off the (noisy) tunnel critical path
                qs = qq + (i * 1e-12).astype(qq.dtype)
                return fn(qs, k, v).astype(q.dtype)
            out = lax.fori_loop(0, n, body, q)
            return jnp.sum(out.astype(jnp.float32))
        return jax.jit(run)

    cs, cl = chain(N_SHORT), chain(N_LONG)
    np.asarray(cs(q, k, v)); np.asarray(cl(q, k, v))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter(); np.asarray(cs(q, k, v))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(cl(q, k, v))
        d2 = time.perf_counter() - t0
        best = min(best, (d2 - d1) / (N_LONG - N_SHORT))
    return best * 1e6


def main():
    global N_SHORT, N_LONG
    which = sys.argv[1] if len(sys.argv) > 1 else "sd1"
    b, h, tq, tk, d = SHAPES[which]
    if tk <= 1024:
        # sub-100us kernels: longer chains lift the long-short delta
        # above the tunnel's fetch-time variance
        N_SHORT, N_LONG = 100, 1100
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, tq, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, tk, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, tk, d), jnp.float32).astype(jnp.bfloat16)
    sm = d ** -0.5
    acfg = QCfg(bits=8, symmetric=False)
    dq = jnp.float32(0.03); zq = jnp.float32(128.0)
    dw = jnp.float32(1 / 255.); zw = jnp.float32(0.0)
    qk = ((dq, zq), (dq, zq), (dq, zq))
    rng = (acfg.qrange,) * 3

    res = {}
    res["bf16_flash"] = time_chain(
        lambda q, k, v: flash_attention(q, k, v, sm_scale=sm), q, k, v)
    res["pquant"] = time_chain(
        lambda q, k, v: flash_attention(q, k, v, sm_scale=sm,
                                        p_quant=(dw, zw)), q, k, v)
    res["pquant_az"] = time_chain(
        lambda q, k, v: flash_attention(q, k, v, sm_scale=sm,
                                        p_quant=(dw, zw),
                                        p_always_zero=True), q, k, v)
    res["fqk"] = time_chain(
        lambda q, k, v: flash_attention(q, k, v, sm_scale=sm,
                                        qkv_quant=qk, qkv_ranges=rng,
                                        p_quant=(dw, zw),
                                        p_always_zero=True,
                                        int8_matmul=False), q, k, v)
    res["int8"] = time_chain(
        lambda q, k, v: flash_attention(q, k, v, sm_scale=sm,
                                        qkv_quant=qk, qkv_ranges=rng,
                                        p_quant=(dw, zw)), q, k, v)
    if tq <= 512:
        # whole-row tiles: one grid cell per (b, h) at small T
        res["int8_bq_full"] = time_chain(
            lambda q, k, v: flash_attention(q, k, v, sm_scale=sm,
                                            qkv_quant=qk, qkv_ranges=rng,
                                            p_quant=(dw, zw),
                                            block_q=tq, block_k=tk),
            q, k, v)

    def fqp(q, k, v):
        qf = fake_quant(q, dq, zq, acfg)
        kf = fake_quant(k, dq, zq, acfg)
        vf = fake_quant(v, dq, zq, acfg)
        return flash_attention(qf, kf, vf, sm_scale=sm, p_quant=(dw, zw))

    res["fq+pquant"] = time_chain(fqp, q, k, v)

    def einsum(q, k, v):
        s = jnp.einsum("bhid,bhjd->bhij", q, k,
                       preferred_element_type=jnp.float32) * sm
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhij,bhjd->bhid", p, v,
                          preferred_element_type=jnp.float32)

    if tk <= 1024 or which == "xattn":
        res["einsum"] = time_chain(einsum, q, k, v)

        def fq_einsum(q, k, v):
            qf = fake_quant(q, dq, zq, acfg)
            kf = fake_quant(k, dq, zq, acfg)
            vf = fake_quant(v, dq, zq, acfg)
            s = jnp.einsum("bhid,bhjd->bhij", qf, kf,
                           preferred_element_type=jnp.float32) * sm
            p = jax.nn.softmax(s, axis=-1)
            wcfg = QCfg(bits=8, symmetric=False, always_zero=True)
            p = fake_quant(p, dw, zw, wcfg).astype(q.dtype)
            return jnp.einsum("bhij,bhjd->bhid", p, vf,
                              preferred_element_type=jnp.float32
                              ).astype(q.dtype)

        res["fq_einsum"] = time_chain(fq_einsum, q, k, v)
        pq_ = (acfg, {"delta": dq, "zp": zq})
        pw_ = (QCfg(bits=8, symmetric=False, always_zero=True),
               {"delta": dw, "zp": zw})
        res["einsum_i8"] = time_chain(
            lambda q, k, v: attn_ops._int8_materialized(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), sm, pq_, pq_, pq_, pw_,
                jnp.bfloat16).transpose(0, 2, 1, 3), q, k, v)

    print(which, {kk_: round(vv, 1) for kk_, vv in res.items()}, "us/call")


if __name__ == "__main__":
    main()
