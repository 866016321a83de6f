"""Capture an xprof trace of the deployed SD v1.4 UNet step and dump
per-op HLO stats (same harness as profile_cifar.py, SD shapes).

Usage: python scripts/profile_sd.py [variant] [outdir]
  variant: w8a8_sym | sm_fp | wonly | fp   (default w8a8_sym)
"""

import glob
import gzip
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_step(variant):
    from tfmq_dm_tpu.models import ldm_unet, ldm_units
    from tfmq_dm_tpu.quant.deploy import (cast_fp_params,
                                          deploy_weights,
                                          make_deployed_model_fn,
                                          specialize_maps)
    from tfmq_dm_tpu.quant.fsc import _fsc_init
    from tfmq_dm_tpu.quant.recon import init_weight_qparams

    cfg = ldm_unet.sd_v1_config()
    b = 8
    params = ldm_unet.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 4))
    t = jnp.full((b,), 500, jnp.int32)
    c = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768))

    if variant == "fp":
        pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

        def step(p, xx, tt, cc):
            return ldm_unet.apply(
                p, cfg, xx.astype(jnp.bfloat16), tt,
                context=cc.astype(jnp.bfloat16)).astype(jnp.float32)

        return step, pb, x, t, c

    adapter = ldm_units.build_adapter(cfg, w_bits=8, a_bits=8,
                                      use_aq=True, w_sym=True)
    if variant == "sm_fp":
        for name, pol in adapter.policy.layers.items():
            if pol.a_cfg is not None and pol.a_cfg.always_zero:
                pol.aq = False
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    astate, _ = _fsc_init(adapter, "minmax", params, wstate,
                          (x[:2], t[:2], c[:2]))
    astate = jax.tree.map(lambda a: a[None], astate)
    deployed = deploy_weights(adapter.policy, params, wstate)
    use_aq = variant != "wonly"
    deployed = specialize_maps(adapter, params, deployed,
                               example_args=(x[:1], t[:1], c[:1]),
                               use_aq=use_aq)

    def step(bundle, xx, tt, cc):
        p, dep, ast = bundle
        fn = make_deployed_model_fn(adapter, p, dep, ast, use_aq=use_aq,
                                    act_dtype=jnp.bfloat16)
        return fn(xx.astype(jnp.bfloat16), tt, 0,
                  cc.astype(jnp.bfloat16)).astype(jnp.float32)

    pd = cast_fp_params(params)
    return step, (pd, deployed, astate), x, t, c


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "w8a8_sym"
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/xprof_sd_{variant}"
    step, p, x, t, c = build_step(variant)

    @jax.jit
    def loop(p, x, t, c):
        return lax.fori_loop(0, 10, lambda i, xx: step(p, xx, t, c), x)

    np.asarray(loop(p, x, t, c))  # compile + warm
    jax.profiler.start_trace(outdir)
    np.asarray(loop(p, x, t, c))
    jax.profiler.stop_trace()
    print("trace at", outdir)

    try:
        from xprof.convert import _xplane_to_tools_data as conv
    except ImportError:
        print("xprof opstats unavailable; use scripts/trace_summary.py")
        return
    sess = glob.glob(os.path.join(outdir, "plugins/profile/*"))[-1]
    xspaces = glob.glob(os.path.join(sess, "*.xplane.pb"))
    data, _ = conv.xspace_to_tool_data(xspaces, "framework_op_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        open(f"/tmp/opstats_sd_{variant}.csv", "wb").write(data)
        print("op stats csv at", f"/tmp/opstats_sd_{variant}.csv")


if __name__ == "__main__":
    main()
