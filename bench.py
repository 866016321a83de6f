"""Benchmark: quantized UNet denoise throughput vs bf16 FP on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- metric: w8a8 DDIM CIFAR-10 UNet denoise throughput (image-denoise-steps
  per second per chip), batch 64.
- vs_baseline: ratio vs the bf16 full-precision UNet on the same chip —
  the reference deploys integer speed only via external OpenVINO
  (README.md:132) and its own fake-quant path runs *slower* than FP;
  BASELINE.json's north star is >=2x bf16 with real int kernels.
"""

import json
import time

import jax
import jax.numpy as jnp

# persistent compile cache: repeat bench runs skip the (slow) TPU compile
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _throughput(fn, x, t, batch, iters=50, warmup=2):
    """Chained timing: feed the UNet output back as its input so every
    iteration depends on the previous one (identical-input executions get
    deduped/pipelined by the runtime and report impossible speeds)."""
    for _ in range(warmup):
        x = fn(x, t)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, t)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    from tfmq_dm_tpu.models import ddim_unet, ddim_units
    from tfmq_dm_tpu.quant.inference import make_model_fn
    from tfmq_dm_tpu.quant.recon import init_weight_qparams

    cfg = ddim_unet.cifar10_config()
    b = 64
    key = jax.random.PRNGKey(0)
    params = ddim_unet.init_params(key, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 32, 32, 3))
    t = jnp.full((b,), 500, jnp.int32)

    # bf16 FP baseline (params cross jit as ARGUMENTS — closures embed
    # them as program constants and bloat the compile payload)
    params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    fp_jit = jax.jit(lambda p, x, t: ddim_unet.apply(
        p, cfg, x.astype(jnp.bfloat16), t).astype(jnp.float32))
    fp_tp = _throughput(lambda x, t: fp_jit(params_bf16, x, t), x, t, b)

    # w8a8 DEPLOYED integer path (real int8 MXU convs, bf16 elsewhere)
    from tfmq_dm_tpu.quant.deploy import (deploy_weights,
                                          make_deployed_model_fn)
    from tfmq_dm_tpu.quant.fsc import _fsc_init

    adapter = ddim_units.build_adapter(cfg, w_bits=8, a_bits=8)
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    astate, _ = _fsc_init(adapter, "minmax", params, wstate,
                          (x[:8], t[:8]))
    astate = jax.tree.map(lambda a: a[None], astate)  # 1 FSC group
    deployed = deploy_weights(adapter.policy, params, wstate)

    def q_fwd(bundle, x, t):
        p, dep, ast = bundle
        model_fn = make_deployed_model_fn(adapter, p, dep, ast,
                                          use_aq=True,
                                          act_dtype=jnp.bfloat16)
        return model_fn(x.astype(jnp.bfloat16), t, 0).astype(jnp.float32)

    q_jit = jax.jit(q_fwd)
    bundle = (params, deployed, astate)
    q_tp = _throughput(lambda x, t: q_jit(bundle, x, t), x, t, b)

    print(json.dumps({
        "metric": "cifar10_unet_w8a8_denoise_steps_per_sec_per_chip",
        "value": round(q_tp, 2),
        "unit": "img-denoise-steps/s",
        "vs_baseline": round(q_tp / fp_tp, 4),
    }))


if __name__ == "__main__":
    main()
