"""Microbench: fused GN+SiLU+int8-quantize Pallas kernel vs the unfused
XLA chain, at SD resblock shapes. Usage: python scripts/micro_gn.py"""
import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tfmq_dm_tpu.ops import nn as fnn
from tfmq_dm_tpu.ops.pallas_kernels import gn_swish_quant_int8
from tfmq_dm_tpu.ops.int_ops import quantize_act_int8
from tfmq_dm_tpu.quant.quantizer import QCfg

N_SHORT, N_LONG, REPS = 50, 550, 3
cfg = QCfg(bits=8, symmetric=False)

def timeit(fn, x):
    def chain(n):
        def run(x):
            def body(i, carry):
                xq = fn(x + (i * 1e-12).astype(x.dtype))
                return carry + jnp.sum(xq.astype(jnp.int32))
            return lax.fori_loop(0, n, body, jnp.int32(0))
        return jax.jit(run)
    cs, cl = chain(N_SHORT), chain(N_LONG)
    np.asarray(cs(x)); np.asarray(cl(x))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter(); np.asarray(cs(x)); d1 = time.perf_counter()-t0
        t0 = time.perf_counter(); np.asarray(cl(x)); d2 = time.perf_counter()-t0
        best = min(best, (d2-d1)/(N_LONG-N_SHORT))
    return best*1e6

for (B,H,W,C) in [(8,64,64,320), (8,32,32,640), (8,16,16,1280)]:
    x = jax.random.normal(jax.random.PRNGKey(0), (B,H,W,C), jnp.float32).astype(jnp.bfloat16)
    gamma = jnp.ones((C,), jnp.float32); beta = jnp.zeros((C,), jnp.float32)
    delta, zp = jnp.float32(0.02), jnp.float32(117.0)
    def unfused(x):
        y = fnn.group_norm(x, gamma, beta, groups=32, eps=1e-5)
        y = fnn.swish(y)
        return quantize_act_int8(y, delta, zp, cfg)[0]
    def fused(x):
        return gn_swish_quant_int8(x, gamma, beta, delta, zp, cfg,
                                   groups=32, eps=1e-5)[0]
    t_un = timeit(unfused, x)
    t_fu = timeit(fused, x)
    print(f"{(B,H,W,C)}: unfused {t_un:.1f} us, fused {t_fu:.1f} us "
          f"({t_un/t_fu:.2f}x)")
