"""LDM-family benchmark: cin256-v2 (class-conditional ImageNet 256,
latent 64x64x3) denoise step with double-batched CFG at scale 3.0 —
the reference's `sample_diffusion_ldm.py -c 20 -e 0 --cfg 3.0` per-step
compute — deployed integer kernels vs bf16 FP on one chip.

This covers the LDM shape class between CIFAR (bench.py) and SD v1.4
(bench_sd.py): 4096-token max self-attention at 64^2 latents but much
smaller channel counts than SD, where the int8 MXU win should sit
between CIFAR's 1.06x and SD's 0.96x.

Each measured step runs the REAL CFG structure: eps_uncond and eps_cond
from one doubled batch, combined as e_uc + scale * (e_c - e_uc)
(reference: ddim.py CFG branch / txt2img.py:394-488). Throughput is
reported in image-denoise-steps/s (images per step = batch, not the
doubled internal batch).

Usage: python scripts/bench_cin256.py [batch]
Prints ONE JSON line like bench.py / bench_sd.py.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench_sd import _measure  # noqa: E402  (long/short paired chains)


def main():
    from tfmq_dm_tpu.models import ldm_unet, ldm_units
    from tfmq_dm_tpu.quant.deploy import (cast_fp_params,
                                          deploy_weights,
                                          make_deployed_model_fn,
                                          specialize_maps)
    from tfmq_dm_tpu.quant.fsc import _fsc_init
    from tfmq_dm_tpu.quant.recon import init_weight_qparams

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    b = int(args[0]) if args else 8
    scale = 3.0
    cfg = ldm_unet.cin256_config()
    params = ldm_unet.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (b, cfg.image_size, cfg.image_size,
                           cfg.in_channels))
    t = jnp.full((2 * b,), 500, jnp.int32)
    # class embeddings: [uncond; cond] doubling as in inference
    c = jax.random.normal(jax.random.PRNGKey(2),
                          (2 * b, 1, cfg.context_dim))

    params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def fp_make_body(p, tt, cc):
        cc = cc.astype(jnp.bfloat16)
        cache = ldm_unet.build_cross_kv(p, cfg, cc)

        def body(xx):
            x2 = jnp.concatenate([xx, xx]).astype(jnp.bfloat16)
            eps = ldm_unet.apply(p, cfg, x2, tt, context=cc,
                                 kv_cache=cache)
            e_uc, e_c = jnp.split(eps, 2)
            return (e_uc + scale * (e_c - e_uc)).astype(jnp.float32)
        return body

    fp_best, fp_med, fp_reps = _measure(fp_make_body, params_bf16,
                                        x, t, c, b)

    params_q = cast_fp_params(params)

    def quantized_tp(w_bits: int):
        adapter = ldm_units.build_adapter(cfg, w_bits=w_bits, a_bits=8,
                                          use_aq=True, w_sym=True)
        wstate = init_weight_qparams(adapter.policy, params,
                                     scaler="minmax")
        astate, _ = _fsc_init(adapter, "minmax", params, wstate,
                              (jnp.concatenate([x[:1], x[:1]]), t[:2],
                               c[:2]))
        astate = jax.tree.map(lambda a: a[None], astate)  # 1 FSC group
        deployed = deploy_weights(adapter.policy, params, wstate)
        deployed = specialize_maps(adapter, params, deployed,
                                   example_args=(x[:1], t[:1], c[:1]),
                                   use_aq=True)

        def q_make_body(bundle, tt, cc):
            p, dep, ast = bundle
            cc = cc.astype(jnp.bfloat16)
            kv_fn = lambda q0: ldm_unet.build_cross_kv(p, cfg, cc,  # noqa: E731
                                                       qctx=q0)
            fn = make_deployed_model_fn(adapter, p, dep, ast,
                                        use_aq=True,
                                        act_dtype=jnp.bfloat16,
                                        kv_cache_fn=kv_fn)

            def body(xx):
                x2 = jnp.concatenate([xx, xx]).astype(jnp.bfloat16)
                eps = fn(x2, tt, 0, cc)
                e_uc, e_c = jnp.split(eps, 2)
                return (e_uc + scale * (e_c - e_uc)).astype(jnp.float32)
            return body

        return _measure(q_make_body, (params_q, deployed, astate),
                        x, t, c, b)

    q8_best, q8_med, q8_reps = quantized_tp(8)
    q4_best, q4_med, q4_reps = quantized_tp(4)
    print(json.dumps({
        "metric": "cin256v2_unet_w4a8_cfg_denoise_steps_per_sec_per_chip",
        "value": round(q4_med, 2),
        "unit": "img-denoise-steps/s",
        "vs_baseline": round(q4_med / fp_med, 4),
        "extra": {
            "batch": b, "cfg_scale": scale,
            "headline_is": "median (vs_baseline = median/median); "
                           "each step = doubled-batch CFG",
            "w8a8_steps_per_sec": round(q8_med, 2),
            "w8a8_vs_baseline": round(q8_med / fp_med, 4),
            "bf16_fp_steps_per_sec": round(fp_med, 2),
            "best": {"bf16_fp": round(fp_best, 2),
                     "w8a8": round(q8_best, 2),
                     "w4a8": round(q4_best, 2),
                     "w4a8_vs_baseline": round(q4_best / fp_best, 4)},
            "reps": {"bf16_fp": fp_reps, "w8a8": q8_reps,
                     "w4a8": q4_reps},
        },
    }))


if __name__ == "__main__":
    main()
