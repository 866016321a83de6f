"""Ablation bench: w8a8 DDIM CIFAR-10 UNet step overhead breakdown.

Variants (batch 64, same harness as bench.py):
  fp         bf16 full precision
  w8a8       deployed asym weights (current bench.py default)
  w8a8_sym   symmetric weight grids
  attn_fp    w8a8_sym, attention act sites FP
  attn_flash w8a8_sym, flash forced on (int8 in-kernel attention at T=256)
  conv_wo    w8a8_sym, conv act-quant off (weight-only), attn quantized
  wonly      weight-only dequant everywhere

Usage: PYTHONPATH=. python scripts/ablate_cifar.py [variants...]
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

N_SHORT, N_LONG, REPS = 10, 60, 3


def _steps_per_sec(step_fn, params, x, t, batch):
    def chain(n):
        def run(p, x, t):
            return lax.fori_loop(0, n,
                                 lambda i, xx: step_fn(p, xx, t), x)
        return jax.jit(run)

    c_short, c_long = chain(N_SHORT), chain(N_LONG)
    np.asarray(c_short(params, x, t))
    np.asarray(c_long(params, x, t))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(c_short(params, x, t))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(c_long(params, x, t))
        d2 = time.perf_counter() - t0
        best = min(best, (d2 - d1) / (N_LONG - N_SHORT))
    return batch / best


def main():
    from tfmq_dm_tpu.models import ddim_unet, ddim_units
    from tfmq_dm_tpu.ops import attention as attn_ops
    from tfmq_dm_tpu.quant.deploy import (cast_fp_params,
                                          deploy_weights,
                                          make_deployed_model_fn,
                                          specialize_maps)
    from tfmq_dm_tpu.quant.fsc import _fsc_init
    from tfmq_dm_tpu.quant.recon import init_weight_qparams

    args = sys.argv[1:]
    b = 64
    if args and args[0].isdigit():
        b = int(args[0])
        args = args[1:]
    want = args or ["fp", "w8a8", "w8a8_sym", "attn_fp",
                    "attn_flash", "conv_wo", "wonly"]
    cfg = ddim_unet.cifar10_config()
    params = ddim_unet.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 32, 32, 3))
    t = jnp.full((b,), 500, jnp.int32)

    results = {}
    if "fp" in want:
        params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                                   params)
        results["fp"] = _steps_per_sec(
            lambda p, xx, tt: ddim_unet.apply(
                p, cfg, xx.astype(jnp.bfloat16), tt).astype(jnp.float32),
            params_bf16, x, t, b)
        print("fp", round(results["fp"], 2), flush=True)

    def quant_variant(w_sym, attn_aq=True, conv_aq=True, use_aq=True,
                      flash="auto", w_bits=8):
        attn_ops.set_flash(flash)
        adapter = ddim_units.build_adapter(cfg, w_bits=w_bits, a_bits=8,
                                           w_sym=w_sym)
        for name, pol in adapter.policy.layers.items():
            if pol.w_cfg is None and not attn_aq:
                pol.aq = False
            if pol.w_cfg is not None and not conv_aq:
                pol.aq = False
        wstate = init_weight_qparams(adapter.policy, params,
                                     scaler="minmax")
        astate, _ = _fsc_init(adapter, "minmax", params, wstate,
                              (x[:8], t[:8]))
        astate = jax.tree.map(lambda a: a[None], astate)
        deployed = deploy_weights(adapter.policy, params, wstate)
        deployed = specialize_maps(adapter, params, deployed,
                                   example_args=(x[:1], t[:1]),
                                   use_aq=use_aq)
        # fast-deploy carriers: FP-fallback layers + glue ops run bf16
        # (same dtype as the FP baseline); int correction math stays f32
        pd = cast_fp_params(params)

        def q_step(bundle, xx, tt):
            p, dep, ast = bundle
            fn = make_deployed_model_fn(adapter, p, dep, ast,
                                        use_aq=use_aq,
                                        act_dtype=jnp.bfloat16)
            return fn(xx.astype(jnp.bfloat16), tt, 0).astype(jnp.float32)

        r = _steps_per_sec(q_step, (pd, deployed, astate), x, t, b)
        attn_ops.set_flash("auto")
        return r

    variants = {
        "w8a8": dict(w_sym=False),
        "w8a8_sym": dict(w_sym=True),
        "w4a8": dict(w_sym=True, w_bits=4),
        "attn_fp": dict(w_sym=True, attn_aq=False),
        "attn_flash": dict(w_sym=True, flash="on"),
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
