import jax, jax.numpy as jnp, numpy as np
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tfmq_dm_tpu.models import ldm_unet

cfg = ldm_unet.sd_v1_config()
b = 8
params = ldm_unet.init_params(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
x = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 4))
t = jnp.full((b,), 500, jnp.int32)
c = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768)).astype(jnp.bfloat16)

@jax.jit
def run(p, x, t, c):
    return lax.fori_loop(0, 5, lambda i, xx: ldm_unet.apply(
        p, cfg, xx.astype(jnp.bfloat16), t, context=c).astype(jnp.float32), x)

np.asarray(run(params, x, t, c))
jax.profiler.start_trace("/tmp/xprof_sd")
np.asarray(run(params, x, t, c))
jax.profiler.stop_trace()
print("done")
