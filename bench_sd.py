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

Both the FP and quantized paths hoist the constant-context cross-attn
K/V projections out of the denoise loop (ldm_unet.build_cross_kv);
--no-kv-cache disables the cache for A/B (the reference recomputes
them per step, attention.py:176-193).

Headline numbers are MEDIANS over REPS long/short loop pairs
(nonphysical reps discarded and re-measured); best-of-reps and the full
spread ride in extra so the shared-chip tunnel noise (±10%) is visible
in the artifact.

Usage: python bench_sd.py [batch] [--skip-int4] [--no-kv-cache]
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

N_SHORT, N_LONG, REPS = 4, 16, 5


def _measure(make_body, params, x, t, c, batch):
    """steps/s: (best, median, per-rep list). ``make_body(p, t, c)`` runs
    once per jitted chain (outside the loop) so per-prompt setup — the
    K/V cache — is excluded exactly as in a real 50-step rollout, and
    the long-short difference cancels fetch/dispatch overhead."""
    def chain(n):
        def run(p, x, t, c):
            body = make_body(p, t, c)
            return lax.fori_loop(0, n, lambda i, xx: body(xx), x)
        return jax.jit(run)

    c_short, c_long = chain(N_SHORT), chain(N_LONG)
    np.asarray(c_short(params, x, t, c))
    np.asarray(c_long(params, x, t, c))
    reps = []
    attempts = 0
    while len(reps) < REPS and attempts < 3 * REPS:
        attempts += 1
        t0 = time.perf_counter()
        np.asarray(c_short(params, x, t, c))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(c_long(params, x, t, c))
        d2 = time.perf_counter() - t0
        est = batch * (N_LONG - N_SHORT) / (d2 - d1)
        # nonphysical reps (long-minus-short gone negative under tunnel
        # noise) are discarded and re-measured, never averaged in
        if np.isfinite(est) and est > 0:
            reps.append(est)
    if not reps:
        raise RuntimeError("no physical (positive) bench rep in "
                           f"{attempts} attempts")
    return max(reps), float(np.median(reps)), [round(r, 2) for r in reps]


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
    use_kv = "--no-kv-cache" not in sys.argv
    if os.environ.get("TFMQ_FAST_ATTN"):  # A/B the fast-deploy q/k/v
        from tfmq_dm_tpu.ops.attention import set_fast_attn
        set_fast_attn(os.environ["TFMQ_FAST_ATTN"])
    cfg = ldm_unet.sd_v1_config()
    params = ldm_unet.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 4))
    t = jnp.full((b,), 500, jnp.int32)
    c = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768))

    params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def fp_make_body(p, tt, cc):
        cc = cc.astype(jnp.bfloat16)
        cache = ldm_unet.build_cross_kv(p, cfg, cc) if use_kv else None

        def body(xx):
            return ldm_unet.apply(
                p, cfg, xx.astype(jnp.bfloat16), tt, context=cc,
                kv_cache=cache).astype(jnp.float32)
        return body

    fp_best, fp_med, fp_reps = _measure(fp_make_body, params_bf16,
                                        x, t, c, b)

    # fast-deploy carriers: FP-fallback layers + glue ops run bf16
    params_q = cast_fp_params(params)

    def quantized_tp(w_bits: int, int4_serving: bool = False):
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

        def q_make_body(bundle, tt, cc):
            p, dep, ast = bundle
            cc = cc.astype(jnp.bfloat16)
            kv_fn = (lambda q0: ldm_unet.build_cross_kv(p, cfg, cc,
                                                        qctx=q0)) \
                if use_kv else None
            fn = make_deployed_model_fn(adapter, p, dep, ast,
                                        use_aq=True,
                                        act_dtype=jnp.bfloat16,
                                        kv_cache_fn=kv_fn)

            def body(xx):
                return fn(xx.astype(jnp.bfloat16), tt, 0,
                          cc).astype(jnp.float32)
            return body

        return _measure(q_make_body, (params_q, deployed, astate),
                        x, t, c, b)

    q8_best, q8_med, q8_reps = quantized_tp(8)
    q4_best, q4_med, q4_reps = quantized_tp(4)
    # headline = MEDIAN vs median baseline (best-of-reps cherry-picks
    # tunnel noise; round-3 verdict); best rides in extra for audit
    extra = {
        "batch": b,
        "kv_cache": use_kv,
        "headline_is": "median (vs_baseline = median/median)",
        "w8a8_steps_per_sec": round(q8_med, 2),
        "w8a8_vs_baseline": round(q8_med / fp_med, 4),
        "bf16_fp_steps_per_sec": round(fp_med, 2),
        "best": {"bf16_fp": round(fp_best, 2), "w8a8": round(q8_best, 2),
                 "w4a8": round(q4_best, 2),
                 "w4a8_vs_baseline": round(q4_best / fp_best, 4)},
        "reps": {"bf16_fp": fp_reps, "w8a8": q8_reps, "w4a8": q4_reps},
    }
    if not skip_int4:
        # never lose the headline numbers to a serving-mode failure
        try:
            q4s_best, q4s_med, q4s_reps = quantized_tp(4,
                                                       int4_serving=True)
            extra["w4a8_int4_serving_steps_per_sec"] = round(q4s_med, 2)
            extra["w4a8_int4_serving_vs_baseline"] = round(
                q4s_med / fp_med, 4)
            extra["reps"]["w4a8_int4_serving"] = q4s_reps
        except Exception as e:  # noqa: BLE001
            extra["w4a8_int4_serving_error"] = f"{type(e).__name__}"
            print(f"int4-serving variant failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "sd_v14_unet_w4a8_denoise_steps_per_sec_per_chip",
        "value": round(q4_med, 2),
        "unit": "img-denoise-steps/s",
        "vs_baseline": round(q4_med / fp_med, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
