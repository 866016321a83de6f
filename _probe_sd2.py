import time, sys, jax, jax.numpy as jnp, numpy as np
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if len(sys.argv) > 1 and sys.argv[1] == "noflash":
    from tfmq_dm_tpu.ops import attention
    attention.set_flash("off")
from tfmq_dm_tpu.models import ldm_unet

cfg = ldm_unet.sd_v1_config()
b = 8
params = ldm_unet.init_params(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
x = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 4))
t = jnp.full((b,), 500, jnp.int32)
c = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768)).astype(jnp.bfloat16)

def chain(n):
    @jax.jit
    def run(p, x, t, c):
        return lax.fori_loop(0, n, lambda i, xx: ldm_unet.apply(
            p, cfg, xx.astype(jnp.bfloat16), t, context=c).astype(jnp.float32), x)
    return run
cs, cl = chain(4), chain(16)
np.asarray(cs(params, x, t, c)); np.asarray(cl(params, x, t, c))
best = 1e9
for _ in range(3):
    t0=time.perf_counter(); np.asarray(cs(params,x,t,c)); d1=time.perf_counter()-t0
    t0=time.perf_counter(); np.asarray(cl(params,x,t,c)); d2=time.perf_counter()-t0
    best=min(best,(d2-d1)/12)
print(f"fp sd ({sys.argv[1] if len(sys.argv)>1 else 'flash'}): {best*1e3:.1f} ms/step -> {8/best:.1f} img-steps/s")
