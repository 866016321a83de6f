"""Benchmark: quantized UNet denoise throughput vs bf16 FP on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {}}

- metric: **w4a8** DDIM CIFAR-10 UNet denoise throughput
  (image-denoise-steps per second per chip), batch 64, real int8 MXU
  kernels executing the 4-bit codes — the BASELINE.json metric
  ("w4a8 UNet denoise steps/sec/chip"). ``extra`` carries the w8a8 and
  bf16-FP companions from the same run.
- vs_baseline: ratio vs the bf16 full-precision UNet on the same chip —
  the reference deploys integer speed only via external OpenVINO
  (README.md:132) and its own fake-quant path runs *slower* than FP;
  BASELINE.json's north star is >=2x bf16 with real int kernels.
- the SD v1.4 north-star measurement lives in ``bench_sd.py`` (its
  compile takes minutes through the remote relay; results recorded in
  docs/PERF.md).

Timing methodology: the denoise loop runs ON DEVICE as a
``lax.fori_loop`` (exactly how the samplers execute) and we time the
*difference* between a long and a short loop fetched to host — on the
remote-tunnel runtime, ``block_until_ready`` acks before execution
finishes and per-call dispatch costs a host round-trip, so host-side
per-call chaining measures the tunnel, not the chip.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# persistent compile cache: repeat bench runs skip the (slow) TPU compile
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# long chains: the shared tunnel chip shows +-10% noise on sub-second
# measurements; ~1 s of on-device work per rep tightens the estimate
N_SHORT, N_LONG, REPS = 20, 220, 4


def _steps_per_sec(step_fn, params, x, t, batch):
    """step_fn(params, x, t) -> x. Returns a list of REPS per-rep
    image-denoise-steps/sec estimates (callers report min/median so the
    tunnel's ±10% noise is visible in the artifact, not hidden in a
    single scalar)."""

    def chain(n):
        def run(p, x, t):
            return lax.fori_loop(0, n,
                                 lambda i, xx: step_fn(p, xx, t), x)
        return jax.jit(run)

    c_short, c_long = chain(N_SHORT), chain(N_LONG)
    np.asarray(c_short(params, x, t))  # compile + warm
    np.asarray(c_long(params, x, t))
    reps = []
    attempts = 0
    while len(reps) < REPS and attempts < 3 * REPS:
        attempts += 1
        t0 = time.perf_counter()
        np.asarray(c_short(params, x, t))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(c_long(params, x, t))
        d2 = time.perf_counter() - t0
        est = batch * (N_LONG - N_SHORT) / (d2 - d1)
        # discard-and-retry nonphysical reps: tunnel noise can make the
        # long-minus-short difference go negative (round 3 recorded a
        # -1492 steps/s rep) — and a near-zero POSITIVE difference is
        # the same noise with the opposite sign, yielding an absurdly
        # large estimate; keeping only one side would bias the median
        # upward. 20 ms floor ≈ rejects estimates beyond ~100x any
        # plausible chip throughput for these shapes.
        if np.isfinite(est) and est > 0 and (d2 - d1) >= 0.02:
            reps.append(est)
    if not reps:
        raise RuntimeError("no physical (positive) bench rep in "
                           f"{attempts} attempts")
    return reps


def _spread(reps):
    s = sorted(reps)
    return {"best": round(s[-1], 2),
            "median": round(s[len(s) // 2], 2),
            "reps": [round(r, 2) for r in s]}


def main():
    from tfmq_dm_tpu.models import ddim_unet, ddim_units
    from tfmq_dm_tpu.quant.recon import init_weight_qparams

    cfg = ddim_unet.cifar10_config()
    b = 64
    key = jax.random.PRNGKey(0)
    params = ddim_unet.init_params(key, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 32, 32, 3))
    t = jnp.full((b,), 500, jnp.int32)

    # bf16 FP baseline
    params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    fp_reps = _steps_per_sec(
        lambda p, xx, tt: ddim_unet.apply(
            p, cfg, xx.astype(jnp.bfloat16), tt).astype(jnp.float32),
        params_bf16, x, t, b)

    # DEPLOYED integer paths (real int8 MXU convs, bf16 elsewhere):
    # w4a8 (the BASELINE.json metric — the int8 kernels execute the
    # 4-bit codes) and w8a8
    from tfmq_dm_tpu.quant.deploy import (cast_fp_params,
                                          deploy_weights,
                                          make_deployed_model_fn,
                                          specialize_maps)
    from tfmq_dm_tpu.quant.fsc import _fsc_init

    def quantized_tp(w_bits: int) -> list:
        # symmetric weight grids are the deployment default: bit-exact
        # vs their own fake-quant sim, FID-equivalent at 8 bits, and the
        # weight-zero-point activation-sum correction vanishes
        # (scripts/ablate_cifar.py: sym beats the bf16 FP baseline,
        # asym does not)
        adapter = ddim_units.build_adapter(cfg, w_bits=w_bits, a_bits=8,
                                           w_sym=True)
        wstate = init_weight_qparams(adapter.policy, params,
                                     scaler="minmax")
        astate, _ = _fsc_init(adapter, "minmax", params, wstate,
                              (x[:8], t[:8]))
        astate = jax.tree.map(lambda a: a[None], astate)  # 1 FSC group
        deployed = deploy_weights(adapter.policy, params, wstate)
        deployed = specialize_maps(adapter, params, deployed,
                                   example_args=(x[:1], t[:1]),
                                   use_aq=True)
        # fast-deploy carriers: FP-fallback layers + glue ops run bf16
        # (the FP baseline's dtype); int8 correction math stays f32
        params_q = cast_fp_params(params)

        def q_step(bundle, xx, tt):
            p, dep, ast = bundle
            model_fn = make_deployed_model_fn(adapter, p, dep, ast,
                                              use_aq=True,
                                              act_dtype=jnp.bfloat16)
            return model_fn(xx.astype(jnp.bfloat16), tt,
                            0).astype(jnp.float32)

        return _steps_per_sec(q_step, (params_q, deployed, astate),
                              x, t, b)

    q8_reps = quantized_tp(8)
    q4_reps = quantized_tp(4)

    # headline = MEDIAN-of-reps vs median baseline (best-of-reps cherry
    # -picks tunnel noise of the same magnitude as the claimed win —
    # round-3 verdict); best + full spread ride in extra for audit
    fp_med = float(np.median(fp_reps))
    q4_med = float(np.median(q4_reps))
    q8_med = float(np.median(q8_reps))
    print(json.dumps({
        "metric": "cifar10_unet_w4a8_denoise_steps_per_sec_per_chip",
        "value": round(q4_med, 2),
        "unit": "img-denoise-steps/s",
        "vs_baseline": round(q4_med / fp_med, 4),
        "extra": {
            "headline_is": "median (vs_baseline = median/median)",
            "w8a8_steps_per_sec": round(q8_med, 2),
            "w8a8_vs_baseline": round(q8_med / fp_med, 4),
            "bf16_fp_steps_per_sec": round(fp_med, 2),
            "w4a8_vs_baseline_best": round(max(q4_reps) / max(fp_reps),
                                           4),
            "w8a8_vs_baseline_best": round(max(q8_reps) / max(fp_reps),
                                           4),
            "spread": {"bf16_fp": _spread(fp_reps),
                       "w4a8": _spread(q4_reps),
                       "w8a8": _spread(q8_reps)},
        },
    }))


if __name__ == "__main__":
    main()
