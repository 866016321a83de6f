"""Train a small DDPM on the on-device synthetic dataset, then save the
EMA params npz — giving the quality harness TRAINED weights to quantize
(random-init UNets prove mechanism; trained ones produce structured
images where quantization damage is visible and meaningful).

This is the reference's (PTQ-unused) trainer, rebuilt TPU-first: the
inner loop is one compiled lax.scan (pipelines/training.py), data is a
pure jittable generator (data/synthetic.py), and the output feeds
straight into scripts/quality_gate.py --ckpt.

Usage:
  python scripts/train_toy.py [--steps 4000] [--batch 128] [--res 32]
      [--ch 64] [--out runs/toy_ddpm.npz] [--sample PNGDIR]
"""

import argparse
import logging
import sys
import time

logging.basicConfig(level=logging.INFO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tfmq_dm_tpu.data.synthetic import blobs_batch
from tfmq_dm_tpu.models import ddim_unet
from tfmq_dm_tpu.pipelines.training import (TrainHP, save_params, train)
from tfmq_dm_tpu.utils.schedules import get_beta_schedule


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--ema", type=float, default=0.999)
    ap.add_argument("--out", default="runs/toy_ddpm.npz")
    ap.add_argument("--config", default=None, choices=["cifar10"],
                    help="train the PUBLISHED architecture "
                         "(ddim/configs/cifar10.yml via "
                         "models.ddim_unet.cifar10_config) instead of "
                         "the --ch/--res toy topology — gives the "
                         "quality gates trained weights at the real "
                         "BASELINE shape")
    ap.add_argument("--dp", type=int, default=0,
                    help="shard the batch over a dp mesh axis")
    ap.add_argument("--sample", default=None, metavar="PNGDIR",
                    help="after training, write a grid of EMA DDIM "
                         "samples to PNGDIR/toy_samples.png")
    args = ap.parse_args()

    if args.config == "cifar10":
        cfg = ddim_unet.cifar10_config()
        args.res, args.ch = cfg.resolution, cfg.ch
    else:
        cfg = ddim_unet.DDIMUNetConfig(
            resolution=args.res, ch=args.ch, ch_mult=(1, 2, 2),
            num_res_blocks=2, attn_resolutions=(args.res // 2,))
    params = ddim_unet.init_params(jax.random.PRNGKey(0), cfg)
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=args.timesteps)
    hp = TrainHP(lr=args.lr, ema_rate=args.ema, batch_size=args.batch,
                 steps=args.steps, chunk=min(100, args.steps))

    mesh = None
    if args.dp > 1:
        from tfmq_dm_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=args.dp, tp=1)

    def apply_fn(p, x_t, t):
        return ddim_unet.apply(p, cfg, x_t, t)

    def batch_fn(k):
        return blobs_batch(k, args.batch, args.res, cfg.in_channels)

    t0 = time.time()

    def log(step, loss):
        print(f"step {step:6d}  loss {loss:9.2f}  "
              f"({time.time() - t0:6.1f}s)", file=sys.stderr)

    _, ema, trace = train(apply_fn, params, betas, hp,
                          jax.random.PRNGKey(1), batch_fn, mesh=mesh,
                          log_fn=log)

    import os
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params(args.out, ema, meta={
        "kind": "ddim_unet", "resolution": args.res, "ch": args.ch,
        "ch_mult": list(cfg.ch_mult), "num_res_blocks": cfg.num_res_blocks,
        "attn_resolutions": list(cfg.attn_resolutions),
        "in_channels": cfg.in_channels,
        "beta_schedule": "linear", "beta_start": 1e-4, "beta_end": 0.02,
        "timesteps": args.timesteps, "train_steps": args.steps,
        "final_loss": float(np.mean(trace[-100:]))})
    print(f"saved EMA params -> {args.out}  "
          f"(loss {trace[0]:.1f} -> {np.mean(trace[-100:]):.1f})")

    if args.sample:
        from tfmq_dm_tpu.samplers.ddim import generalized_scan
        from tfmq_dm_tpu.utils.schedules import skip_seq
        seq = skip_seq("uniform", args.timesteps, 50)
        k_x, k_s = jax.random.split(jax.random.PRNGKey(9))
        x0 = jax.random.normal(
            k_x, (64, args.res, args.res, cfg.in_channels))
        last = jax.jit(lambda x, k: generalized_scan(
            lambda xt, t, i: ddim_unet.apply(ema, cfg, xt, t),
            betas, seq, x, k))(x0, k_s)
        imgs = np.clip(np.asarray(last) * 0.5 + 0.5, 0, 1)
        from tfmq_dm_tpu.pipelines.sampling import save_grid
        stem = os.path.splitext(os.path.basename(args.out))[0]
        path = os.path.join(args.sample, f"{stem}_samples.png")
        save_grid(imgs, path, n_rows=8)
        print(f"sample grid -> {path}")


if __name__ == "__main__":
    main()
