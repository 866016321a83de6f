"""Ablation bench: where does the w8a8 SD step spend its overhead?

Variants on one chip, batch-8 CFG rows (same harness as bench_sd.py):
  fp        bf16 full precision
  w8a8      deployed asym weights (current bench_sd default)
  w8a8_sym  symmetric weight grids
  attn_fp   w8a8_sym but attention act sites FP (bf16 flash kernels)
  conv_wo   w8a8_sym but conv/linear act-quant off (weight-only dequant),
            attention still quantized
  wonly     no act quant anywhere (weight-only dequant everywhere)

Usage: python scripts/ablate_sd.py [variants...]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_SHORT, N_LONG, REPS = 4, 16, 3


def _steps_per_sec(step_fn, params, x, t, c, batch):
    def chain(n):
        def run(p, x, t, c):
            return lax.fori_loop(
                0, n, lambda i, xx: step_fn(p, xx, t, c), x)
        return jax.jit(run)

    c_short, c_long = chain(N_SHORT), chain(N_LONG)
    np.asarray(c_short(params, x, t, c))
    np.asarray(c_long(params, x, t, c))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(c_short(params, x, t, c))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(c_long(params, x, t, c))
        d2 = time.perf_counter() - t0
        best = min(best, (d2 - d1) / (N_LONG - N_SHORT))
    return batch / best


def main():
    from tfmq_dm_tpu.models import ldm_unet, ldm_units
    from tfmq_dm_tpu.quant.deploy import (cast_fp_params,
                                          deploy_weights,
                                          make_deployed_model_fn,
                                          specialize_maps)
    from tfmq_dm_tpu.quant.fsc import _fsc_init
    from tfmq_dm_tpu.quant.recon import init_weight_qparams

    args = sys.argv[1:]
    b = 8
    if args and args[0].isdigit():
        b = int(args[0])
        args = args[1:]
    want = args or ["fp", "w8a8", "w8a8_sym", "attn_fp",
                    "fq_attn", "sm_fp", "conv_wo", "wonly"]
    cfg = ldm_unet.sd_v1_config()
    params = ldm_unet.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 4))
    t = jnp.full((b,), 500, jnp.int32)
    c = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768))

    results = {}

    if "fp" in want:
        params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                                   params)
        results["fp"] = _steps_per_sec(
            lambda p, xx, tt, cc: ldm_unet.apply(
                p, cfg, xx.astype(jnp.bfloat16), tt,
                context=cc.astype(jnp.bfloat16)).astype(jnp.float32),
            params_bf16, x, t, c, b)
        print("fp", round(results["fp"], 2), flush=True)

    def quant_variant(w_sym, attn_aq=True, conv_aq=True, use_aq=True,
                      int8_attn=True, sm_aq=True):
        from tfmq_dm_tpu.ops import attention as attn_ops
        attn_ops.set_int8_attention(int8_attn)
        adapter = ldm_units.build_adapter(cfg, w_bits=8, a_bits=8,
                                          use_aq=True, w_sym=w_sym)
        for name, pol in adapter.policy.layers.items():
            if pol.w_cfg is None and not attn_aq:
                pol.aq = False
            if (pol.a_cfg is not None and pol.a_cfg.always_zero
                    and not sm_aq):
                pol.aq = False
            if pol.w_cfg is not None and not conv_aq:
                pol.aq = False
        wstate = init_weight_qparams(adapter.policy, params,
                                     scaler="minmax")
        astate, _ = _fsc_init(adapter, "minmax", params, wstate,
                              (x[:2], t[:2], c[:2]))
        astate = jax.tree.map(lambda a: a[None], astate)
        deployed = deploy_weights(adapter.policy, params, wstate)
        deployed = specialize_maps(adapter, params, deployed,
                                   example_args=(x[:1], t[:1], c[:1]),
                                   use_aq=use_aq)
        # fast-deploy carriers: FP-fallback layers + glue ops run bf16
        pd = cast_fp_params(params)

        def q_step(bundle, xx, tt, cc):
            p, dep, ast = bundle
            fn = make_deployed_model_fn(adapter, p, dep, ast,
                                        use_aq=use_aq,
                                        act_dtype=jnp.bfloat16)
            return fn(xx.astype(jnp.bfloat16), tt, 0,
                      cc.astype(jnp.bfloat16)).astype(jnp.float32)

        r = _steps_per_sec(q_step, (pd, deployed, astate),
                           x, t, c, b)
        attn_ops.set_int8_attention(True)
        return r

    variants = {
        "w8a8": dict(w_sym=False),
        "w8a8_sym": dict(w_sym=True),
        "attn_fp": dict(w_sym=True, attn_aq=False),
        "fq_attn": dict(w_sym=True, int8_attn=False),
        "sm_fp": dict(w_sym=True, sm_aq=False),
        "conv_wo": dict(w_sym=True, conv_aq=False),
        "wonly": dict(w_sym=True, use_aq=False),
    }
    for name, kw in variants.items():
        if name not in want:
            continue
        results[name] = quant_variant(**kw)
        print(name, round(results[name], 2), flush=True)

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
