"""Microbench: where the exact int8 conv pipeline loses vs bf16.

Stages at model shapes, timed as on-device fori_loop chains:
  bf16      lax conv, bf16 operands
  i8_raw    lax conv, int8 operands, int32 accumulate (no epilogue)
  i8_deq    i8_raw + scale epilogue only (acc * s + b)
  i8_sym    full int_ops.int8_conv2d with sym weights (w_map corr)
  i8_asym   full int8_conv2d with asym weights (xsum + border maps)
  q+i8_sym  quantize_act_int8 from bf16 + i8_sym
  f32elt    bf16 conv but f32 input act (cast inside, out f32)

Usage: python scripts/micro_conv.py [cifar|sd|sd2]
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
SHAPES = {
    "cifar": ((64, 32, 32, 128), (3, 3, 128, 128)),
    "cifar2": ((64, 16, 16, 256), (3, 3, 256, 256)),
    "sd": ((8, 64, 64, 320), (3, 3, 320, 320)),
    "sd2": ((8, 32, 32, 640), (3, 3, 640, 640)),
}


def time_chain(fn, x, *args):
    """fn(x, *args) -> same-shape x; time via long-short loop diff.
    A per-rep ``salt`` is mixed into the input so no two dispatches are
    identical (the remote runtime dedups identical executions), and the
    loop body re-salts per iteration so value collapse (e.g. int8 chains
    hitting all-zeros) cannot constant-fold the chain."""
    def chain(n):
        def run(x, salt, *a):
            def body(i, xx):
                if xx.dtype == jnp.int8:
                    xx = jnp.bitwise_xor(
                        xx, ((salt + i) % 3).astype(jnp.int8))
                else:
                    xx = xx + (salt % 2).astype(xx.dtype) * 1e-3
                return fn(xx, *a)
            out = lax.fori_loop(0, n, body, x)
            # scalar fetch: a full-tensor fetch through the tunnel costs
            # more than the op chain and drowns the measurement
            return jnp.sum(out.astype(jnp.float32))
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
    return best * 1e6  # us


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sd"
    xs, ws = SHAPES[which]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, xs, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), ws, jnp.float32) * 0.05
    b = jnp.zeros((ws[-1],), jnp.float32)
    dn = ("NHWC", "HWIO", "NHWC")
    pads = ((1, 1), (1, 1))

    acfg = QCfg(bits=8, symmetric=False)
    wcfg_a = QCfg(bits=8, symmetric=False, channel_wise=True)
    wcfg_s = QCfg(bits=8, symmetric=True, channel_wise=True)
    da, za = init_qparams(x, acfg, scaler="minmax")
    dwa, zwa = init_qparams(w, wcfg_a, scaler="minmax")
    dws, zws = init_qparams(w, wcfg_s, scaler="minmax")
    iwa = int_ops.quantize_weight_int(w, dwa, zwa, wcfg_a)
    iws = int_ops.quantize_weight_int(w, dws, zws, wcfg_s)
    x8, za_c = int_ops.quantize_act_int8(x, da, za, acfg)
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    res = {}
    res["bf16"] = time_chain(
        lambda xx, ww: (lax.conv_general_dilated(
            xx, ww, (1, 1), pads, dimension_numbers=dn) + b.astype(
                jnp.bfloat16)).astype(jnp.bfloat16), xb, wb)
    res["f32elt"] = time_chain(
        lambda xx, ww: (lax.conv_general_dilated(
            xx.astype(jnp.bfloat16), ww, (1, 1), pads,
            dimension_numbers=dn) + b).astype(jnp.float32), x, wb)

    def i8_raw(xx, ww):
        acc = lax.conv_general_dilated(
            xx, ww, (1, 1), pads, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        # chainable: wrap back to int8 (cheap elementwise)
        return (acc & 0x7f).astype(jnp.int8)

    res["i8_raw"] = time_chain(i8_raw, x8, iws.w_q)

    def i8_deq(xx, ww):
        acc = lax.conv_general_dilated(
            xx, ww, (1, 1), pads, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        out = (da * iws.delta) * acc.astype(jnp.float32) + b
        return (out.astype(jnp.int32) & 0x7f).astype(jnp.int8)

    res["i8_deq"] = time_chain(i8_deq, x8, iws.w_q)

    def full(xx, iw):
        out = int_ops.int8_conv2d(xx, za_c, da, iw, b, stride=1,
                                  pads=pads, out_dtype=jnp.bfloat16)
        return (out.astype(jnp.int32) & 0x7f).astype(jnp.int8)

    res["i8_sym"] = time_chain(full, x8, iws)
    res["i8_asym"] = time_chain(full, x8, iwa)

    def q_full(xx, iw):
        x8_, _ = int_ops.quantize_act_int8(xx, da, za, acfg)
        out = int_ops.int8_conv2d(x8_, za_c, da, iw, b, stride=1,
                                  pads=pads, out_dtype=jnp.bfloat16)
        return out.astype(jnp.bfloat16)

    res["q+i8_sym"] = time_chain(q_full, xb, iws)

    print(which, {k: round(v, 1) for k, v in res.items()}, "us/call")


if __name__ == "__main__":
    main()
