"""SD-scale benchmark: Stable Diffusion v1.4 UNet denoise step,
deployed integer kernels vs bf16 FP, one chip. This is the north-star
setting (BASELINE.md: "w4a8 SD v1.4 512x512 ... >=2x bf16 img/s/chip");
the driver-run `bench.py` keeps the fast CIFAR-10 metric, this script is
the big-model measurement (first run compiles ~minutes through the
remote relay; cached afterwards).

Measures, at the requested batch:
  - bf16 FP baseline
  - w8a8 deployed (int8 MXU convs/linears, sym grids)
  - w4a8 deployed, default mode (the int8 kernels execute 4-bit codes)
  - w4a8 deployed, --int4-serving mode (nibble-packed conv+linear
    weights, half the int8 weight bytes — the small-batch latency mode)

Usage: python bench_sd.py [batch] [--skip-int4]
Prints one JSON line like bench.py with the w4a8 number as the metric.
"""

import json
import os
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

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    b = int(args[0]) if args else 8
    skip_int4 = "--skip-int4" in sys.argv
    if os.environ.get("TFMQ_FAST_ATTN"):  # A/B the fast-deploy q/k/v
        from tfmq_dm_tpu.ops.attention import set_fast_attn
        set_fast_attn(os.environ["TFMQ_FAST_ATTN"])
    cfg = ldm_unet.sd_v1_config()
    params = ldm_unet.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 4))
    t = jnp.full((b,), 500, jnp.int32)
    c = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768))

    params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    fp_tp = _steps_per_sec(
        lambda p, xx, tt, cc: ldm_unet.apply(
            p, cfg, xx.astype(jnp.bfloat16), tt,
            context=cc.astype(jnp.bfloat16)).astype(jnp.float32),
        params_bf16, x, t, c, b)

    # fast-deploy carriers: FP-fallback layers + glue ops run bf16
    params_q = cast_fp_params(params)

    def quantized_tp(w_bits: int, int4_serving: bool = False) -> float:
        # symmetric weight grids: deployment default (see bench.py note)
        adapter = ldm_units.build_adapter(cfg, w_bits=w_bits, a_bits=8,
                                          use_aq=True, w_sym=True)
        wstate = init_weight_qparams(adapter.policy, params,
                                     scaler="minmax")
        astate, _ = _fsc_init(adapter, "minmax", params, wstate,
                              (x[:2], t[:2], c[:2]))
        astate = jax.tree.map(lambda a: a[None], astate)  # 1 FSC group
        deployed = deploy_weights(adapter.policy, params, wstate,
                                  int4_serving=int4_serving)
        deployed = specialize_maps(adapter, params, deployed,
                                   example_args=(x[:1], t[:1], c[:1]),
                                   use_aq=True)

        def q_step(bundle, xx, tt, cc):
            p, dep, ast = bundle
            fn = make_deployed_model_fn(adapter, p, dep, ast,
                                        use_aq=True,
                                        act_dtype=jnp.bfloat16)
            return fn(xx.astype(jnp.bfloat16), tt, 0,
                      cc.astype(jnp.bfloat16)).astype(jnp.float32)

        return _steps_per_sec(q_step, (params_q, deployed, astate),
                              x, t, c, b)

    q8_tp = quantized_tp(8)
    q4_tp = quantized_tp(4)
    extra = {
        "batch": b,
        "w8a8_steps_per_sec": round(q8_tp, 2),
        "w8a8_vs_baseline": round(q8_tp / fp_tp, 4),
        "bf16_fp_steps_per_sec": round(fp_tp, 2),
    }
    if not skip_int4:
        # never lose the headline numbers to a serving-mode failure
        try:
            q4s_tp = quantized_tp(4, int4_serving=True)
            extra["w4a8_int4_serving_steps_per_sec"] = round(q4s_tp, 2)
            extra["w4a8_int4_serving_vs_baseline"] = round(
                q4s_tp / fp_tp, 4)
        except Exception as e:  # noqa: BLE001
            extra["w4a8_int4_serving_error"] = f"{type(e).__name__}"
            print(f"int4-serving variant failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "sd_v14_unet_w4a8_denoise_steps_per_sec_per_chip",
        "value": round(q4_tp, 2),
        "unit": "img-denoise-steps/s",
        "vs_baseline": round(q4_tp / fp_tp, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
