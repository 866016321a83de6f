"""Microbench: the act-quantize -> int8-conv pair, isolating the f32->s8
quantize cost that dominates the deployed CIFAR step (1.7 of 5.6 ms).

Variants (shape (64,32,32,128) x 3x3x128->128 conv, sym weights):
  conv_pre   int8 conv on pre-quantized input (floor cost)
  q_f32      quantize in f32 math + conv
  q_bf16     quantize in bf16 math + conv
  q_noclip   round+clip via min/max in bf16, direct s8 convert + conv
  q_pallas   Pallas quantize kernel + conv

Each timed as an on-device chain with scalar fetch.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tfmq_dm_tpu.ops import int_ops
from tfmq_dm_tpu.quant.quantizer import QCfg, init_qparams

N_SHORT, N_LONG, REPS = 100, 1100, 3


def time_chain(fn, x, *args):
    def chain(n):
        def run(x, salt, *a):
            def body(i, xx):
                if xx.dtype == jnp.int8:
                    xx = jnp.bitwise_xor(
                        xx, ((salt + i) % 3).astype(jnp.int8))
                else:
                    xx = xx + ((salt % 2) * 1e-3).astype(xx.dtype)
                return fn(xx, *a)
            return jnp.sum(lax.fori_loop(0, n, body, x)
                           .astype(jnp.float32))
        return jax.jit(run)

    cs, cl = chain(N_SHORT), chain(N_LONG)
    np.asarray(cs(x, jnp.int32(0), *args))
    np.asarray(cl(x, jnp.int32(1), *args))
    best = float("inf")
    for r in range(REPS):
        t0 = time.perf_counter()
        np.asarray(cs(x, jnp.int32(2 + 2 * r), *args))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(cl(x, jnp.int32(3 + 2 * r), *args))
        d2 = time.perf_counter() - t0
        best = min(best, (d2 - d1) / (N_LONG - N_SHORT))
    return best * 1e6


def main():
    b, hw, c = 64, 32, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, c),
                          jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c),
                          jnp.float32) * 0.05
    acfg = QCfg(bits=8, symmetric=False)
    wcfg = QCfg(bits=8, symmetric=True, channel_wise=True)
    da, za = init_qparams(x.astype(jnp.float32), acfg, scaler="minmax")
    dw_, zw_ = init_qparams(w, wcfg, scaler="minmax")
    iw = int_ops.quantize_weight_int(w, dw_, zw_, wcfg)
    dn = ("NHWC", "HWIO", "NHWC")
    pads = ((1, 1), (1, 1))
    za_c = jnp.float32(za - 128.0)

    def conv_i8(x8):
        acc = lax.conv_general_dilated(
            x8, iw.w_q, (1, 1), pads, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        out = (da * iw.delta) * acc.astype(jnp.float32)
        return out.astype(jnp.bfloat16)

    res = {}
    x8_pre, _ = int_ops.quantize_act_int8(x, da, za, acfg)

    def conv_pre(x8):
        # chain int8->int8: mask output back to int8 via cheap mod
        out = conv_i8(x8)
        return (out.astype(jnp.int32) % 127).astype(jnp.int8)

    res["conv_pre"] = time_chain(conv_pre, x8_pre)

    def q_f32(xx):
        x8, _ = int_ops.quantize_act_int8(xx, da, za, acfg)
        return conv_i8(x8)

    res["q_f32"] = time_chain(q_f32, x)

    def q_bf16(xx):
        d16 = da.astype(jnp.bfloat16)
        xq = jnp.round(xx / d16) + za.astype(jnp.bfloat16)
        xq = jnp.clip(xq, 0.0, 255.0) - jnp.bfloat16(128.0)
        return conv_i8(xq.astype(jnp.int8))

    res["q_bf16"] = time_chain(q_bf16, x)

    def q_int(xx):
        # round-to-int in one convert: scale in bf16, convert f32->s32
        # (round-to-nearest-even), clip in int space
        xq = jnp.round(xx.astype(jnp.float32) / da) + za
        xi = xq.astype(jnp.int32)
        xi = jnp.clip(xi, 0, 255) - 128
        return conv_i8(xi.astype(jnp.int8))

    res["q_int"] = time_chain(q_int, x)

    # pallas quantize
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _qk(dz_ref, x_ref, o_ref):
        d, z = dz_ref[0], dz_ref[1]
        xx = x_ref[...].astype(jnp.float32)
        q = jnp.clip(jnp.round(xx / d) + z, 0.0, 255.0) - 128.0
        o_ref[...] = q.astype(jnp.int8)

    def q_pallas(xx):
        dz = jnp.stack([da, za])
        x8 = pl.pallas_call(
            _qk,
            grid=(b,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, hw, hw, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, hw, hw, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, hw, hw, c), jnp.int8),
        )(dz, xx)
        return conv_i8(x8)

    res["q_pallas"] = time_chain(q_pallas, x)

    print({k: round(v, 1) for k, v in res.items()}, "us/call")


if __name__ == "__main__":
    main()
