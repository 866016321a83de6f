import jax, jax.numpy as jnp, numpy as np
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tfmq_dm_tpu.models import ldm_unet, ldm_units
from tfmq_dm_tpu.quant.deploy import deploy_weights, make_deployed_model_fn
from tfmq_dm_tpu.quant.fsc import _fsc_init
from tfmq_dm_tpu.quant.recon import init_weight_qparams

b = 8
cfg = ldm_unet.sd_v1_config()
params = ldm_unet.init_params(jax.random.PRNGKey(0), cfg)
x = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 4))
t = jnp.full((b,), 500, jnp.int32)
c = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768))
adapter = ldm_units.build_adapter(cfg, w_bits=8, a_bits=8, use_aq=True)
wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
astate, _ = _fsc_init(adapter, "minmax", params, wstate, (x[:2], t[:2], c[:2]))
astate = jax.tree.map(lambda a: a[None], astate)
deployed = deploy_weights(adapter.policy, params, wstate)

def q_step(bundle, xx, tt, cc):
    p, dep, ast = bundle
    fn = make_deployed_model_fn(adapter, p, dep, ast, use_aq=True,
                                act_dtype=jnp.bfloat16)
    return fn(xx.astype(jnp.bfloat16), tt, 0,
              cc.astype(jnp.bfloat16)).astype(jnp.float32)

@jax.jit
def run(bundle, x, t, c):
    return lax.fori_loop(0, 5, lambda i, xx: q_step(bundle, xx, t, c), x)

bundle = (params, deployed, astate)
np.asarray(run(bundle, x, t, c))
jax.profiler.start_trace("/tmp/xprof_sdq")
np.asarray(run(bundle, x, t, c))
jax.profiler.stop_trace()
print("done")
