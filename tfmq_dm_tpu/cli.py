"""tfmq — the unified CLI, covering the reference's four entry scripts
(sample_diffusion_ddim.py, sample_diffusion_ldm.py, txt2img.py,
latent_imagenet_diffusion.py) with one task-parameterized command.

Calibrate (then exit, like the reference's --cali):
  python -m tfmq_dm_tpu.cli --task cifar10 --ckpt ddpm.pth --ptq --cali \\
      --wq 4 --aq 8 --use_aq --cali_save_path cali.npz

Quantized sampling from a calibration artifact:
  python -m tfmq_dm_tpu.cli --task cifar10 --ckpt ddpm.pth --ptq \\
      --cali_ckpt cali.npz --use_aq -n 50000 --batch 64 --out runs/c10

Text-to-image (SD v1.4):
  python -m tfmq_dm_tpu.cli --task sd_v1_4 --ckpt sd-v1-4.ckpt --ptq \\
      --cali_ckpt cali.npz --from-file prompts.txt --scale 7.5

Flags mirror the reference argparse surface
(sample_diffusion_ddim.py:13-107 etc.): --ptq --wq --aq --softmax_a_bit
--cali --cali_ckpt --cali_save_path --use_aq --interval_length plus
sampler/batch knobs. ``--int-kernels`` additionally deploys real int8
MXU kernels (beyond the reference, which fake-quants at FP speed).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("tfmq")
    p.add_argument("--task", required=True,
                   help="cifar10|celeba256|ffhq256|lsun_beds256|"
                        "lsun_churches256|cin256_v2|sd_v1_4|...")
    p.add_argument("--ckpt", required=True, help="torch FP checkpoint")
    p.add_argument("--out", default="runs/out")
    p.add_argument("--seed", type=int, default=1234)
    # quantization (reference flag names)
    p.add_argument("--ptq", action="store_true")
    p.add_argument("--wq", type=int, default=4)
    p.add_argument("--aq", type=int, default=8)
    p.add_argument("--softmax_a_bit", type=int, default=8)
    p.add_argument("--use_aq", action="store_true")
    p.add_argument("--cali", action="store_true",
                   help="run calibration, save artifact, exit")
    p.add_argument("--cali_ckpt", default=None)
    p.add_argument("--cali_save_path", default="cali.npz")
    p.add_argument("--cali_n", type=int, default=None,
                   help="cali samples per timestep (default: task)")
    p.add_argument("--cali_iters", type=int, default=20000)
    p.add_argument("--interval_length", type=int, default=None)
    p.add_argument("--no_running_stat", action="store_true")
    p.add_argument("--resume_dir", default=None,
                   help="per-unit reconstruction checkpoints: completed "
                        "units are skipped on a re-run (beyond the "
                        "reference's all-or-nothing save)")
    p.add_argument("--w_sym", action="store_true",
                   help="symmetric weight quantization grids (faster "
                        "int8 deployment: no activation-sum correction)")
    p.add_argument("--int-kernels", dest="int_kernels",
                   action="store_true",
                   help="deploy real int8 MXU kernels")
    p.add_argument("--int4-serving", dest="int4_serving",
                   action="store_true",
                   help="EXPERIMENTAL: keep 4-bit conv/linear weights "
                        "nibble-packed in HBM (half the weight "
                        "bandwidth; needs --int-kernels --wq 4). "
                        "Measured SLOWER than the default int8-code "
                        "path at every batch size tried on v5e "
                        "(docs/PERF.md) — weight HBM traffic is not "
                        "the bottleneck there; use only on "
                        "weight-bandwidth-bound hardware")
    p.add_argument("--no-kv-cache", dest="no_kv_cache",
                   action="store_true",
                   help="recompute cross-attn K/V of the (constant) "
                        "text/class context at every denoising step, as "
                        "the reference does (attention.py:176-193). The "
                        "default caches them per prompt; under FSC the "
                        "cached projections use calibration group 0 — "
                        "principled, since their input never depends "
                        "on t")
    p.add_argument("--deploy_dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="carrier dtype between deployed int8 ops: "
                        "float32 is bit-exact vs the fake-quant sim; "
                        "bfloat16 (fast mode) runs FP-fallback layers "
                        "and glue ops at the FP baseline's dtype "
                        "(int correction math stays f32)")
    # sampling
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--eta", type=float, default=None)
    # general DPM-Solver configuration (tasks with sampler='dpm'; the
    # reference surface dpm_solver.py:965-1113 beyond the entry-flow
    # default of multistep order-2 dpmsolver++ time_uniform)
    p.add_argument("--dpm_order", type=int, default=None,
                   choices=(1, 2, 3))
    p.add_argument("--dpm_method", default=None,
                   choices=("multistep", "singlestep",
                            "singlestep_fixed", "adaptive"))
    p.add_argument("--dpm_skip", default=None,
                   choices=("time_uniform", "logSNR",
                            "time_quadratic"))
    p.add_argument("--dpm_algorithm", default=None,
                   choices=("dpmsolver++", "dpmsolver"))
    p.add_argument("--dpm_solver_type", default=None,
                   choices=("dpm_solver", "taylor"))
    p.add_argument("--dpm_denoise_to_zero", action="store_true")
    p.add_argument("--scale", type=float, default=None,
                   help="classifier-free guidance scale")
    p.add_argument("-n", "--num_images", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--npz", action="store_true", help="dump npz for FID")
    p.add_argument("--dp", type=int, default=0,
                   help="shard each sampling batch across N devices "
                        "(0 = single device; batch must divide)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel param sharding over N devices "
                        "(combines with --dp on a dp x tp mesh)")
    p.add_argument("--interpolation", action="store_true",
                   help="slerp trajectory between two random latents "
                        "(the reference's --interpolation mode)")
    p.add_argument("--grid", action="store_true",
                   help="also write one tiled grid.png (txt2img grids)")
    p.add_argument("--watermark", action="store_true",
                   help="embed the invisible provenance watermark "
                        "(txt2img put_watermark)")
    # conditioning inputs
    p.add_argument("--prompt", default=None)
    p.add_argument("--from-file", dest="from_file", default=None,
                   help="file with one prompt per line (e.g. COCO)")
    p.add_argument("--classes", default=None,
                   help="comma-separated ImageNet class ids")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    return p


BERT_VOCAB = 30522  # bert-base-uncased (modules.py:54)


def _get_context(task, args, cond_params, n):
    """(context, uncond) conditioning arrays for n samples."""
    from .models import clip_text
    if task.cond == "text":
        if args.from_file:
            with open(args.from_file) as f:
                prompts = [ln.strip() for ln in f if ln.strip()]
        elif args.prompt:
            prompts = [args.prompt]
        else:
            raise SystemExit("--prompt or --from-file required for text")
        prompts = (prompts * ((n + len(prompts) - 1) // len(prompts)))[:n]
        if getattr(task, "bert", None) is not None:
            # LDM text2img family: BERTEmbedder conditioning
            from .models import bert_text
            bcfg = task.bert
            if bcfg.vocab_size == BERT_VOCAB:
                toks = bert_text.tokenize(prompts, max_length=bcfg.max_len)
                utoks = bert_text.tokenize([""] * n,
                                           max_length=bcfg.max_len)
            else:
                toks = bert_text.stub_tokenize(prompts, bcfg)
                utoks = bert_text.stub_tokenize([""] * n, bcfg)
            return (bert_text.apply(cond_params, bcfg, toks),
                    bert_text.apply(cond_params, bcfg, utoks))
        ccfg = task.clip or clip_text.vit_l_14_config()
        if ccfg.vocab_size == clip_text.vit_l_14_config().vocab_size:
            toks = clip_text.tokenize(prompts, max_length=ccfg.max_len)
            utoks = clip_text.tokenize([""] * n,
                                       max_length=ccfg.max_len)
        else:
            # tiny/test tasks: deterministic stub tokenizer (no HF
            # vocab dependency)
            toks = clip_text.stub_tokenize(prompts, ccfg)
            utoks = clip_text.stub_tokenize([""] * n, ccfg)
        ctx = clip_text.apply(cond_params, ccfg, toks)
        uc = clip_text.apply(cond_params, ccfg, utoks)
        return ctx, uc
    if task.cond == "class":
        if args.classes:
            cls = [int(c) for c in args.classes.split(",")]
        else:
            cls = list(range(8))
        cls = (cls * ((n + len(cls) - 1) // len(cls)))[:n]
        y = jnp.asarray(cls, jnp.int32)
        ctx = clip_text.class_embed(cond_params["embedding"], y)
        uc = clip_text.class_embed(
            cond_params["embedding"],
            jnp.full((n,), cond_params["embedding"].shape[0] - 1,
                     jnp.int32))
        return ctx, uc
    return None, None


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s: %(message)s")
    logger = logging.getLogger("tfmq")
    args = build_argparser().parse_args(argv)

    # surface configuration dead-ends instead of silently ignoring flags
    if args.deploy_dtype == "bfloat16" and not (args.ptq
                                                and args.int_kernels):
        logger.warning("--deploy_dtype bfloat16 has no effect without "
                       "--ptq --int-kernels; running the default path")
    if args.interpolation and (args.dp > 1 or args.tp > 1):
        logger.warning("--dp/--tp are ignored in --interpolation mode "
                       "(single-device slerp trajectory)")
    if args.int4_serving and not (args.ptq and args.int_kernels):
        logger.warning("--int4-serving has no effect without "
                       "--ptq --int-kernels; running the default path")

    dpm_cfg = {k: v for k, v in (
        ("order", args.dpm_order), ("method", args.dpm_method),
        ("skip_type", args.dpm_skip),
        ("algorithm_type", args.dpm_algorithm),
        ("solver_type", args.dpm_solver_type),
        ("denoise_to_zero", args.dpm_denoise_to_zero or None),
    ) if v is not None} or None

    # honor JAX_PLATFORMS even when a platform plugin (e.g. the axon TPU
    # sitecustomize) force-updated jax_platforms at interpreter start
    plat = os.environ.get("JAX_PLATFORMS")
    if plat and "," not in plat:
        jax.config.update("jax_platforms", plat)

    from .configs.tasks import get_task
    from .models import ddim_unet, ldm_unet
    from .pipelines import loading, ptq, sampling
    from .quant.calibrate import load_cali_model
    from .quant.deploy import deploy_weights, make_deployed_model_fn
    from .quant.inference import make_model_fn
    from .samplers.ldm import group_of_step_from_t

    task = get_task(args.task)
    if args.interval_length is not None:
        import dataclasses
        task = dataclasses.replace(task,
                                   interval_length=args.interval_length)
    key = jax.random.PRNGKey(args.seed)
    os.makedirs(args.out, exist_ok=True)

    # ---- load FP model ----
    if task.family == "ddim":
        if not os.path.exists(args.ckpt):
            # registry name (e.g. "ema_cifar10"): resolve from the
            # md5-verified pretrained-DDPM cache (ckpt_util parity)
            from .pipelines.ckpt_util import URLS, get_ckpt_path
            if args.ckpt.replace("church_outdoor", "church") in URLS:
                args.ckpt = get_ckpt_path(args.ckpt, check=True)
        params = loading.load_ddim_checkpoint(args.ckpt, task.unet)
        vae_params = cond_params = None

        def fp_apply_p(p, x, t, c=None, qctx=None, kv=None):
            return ddim_unet.apply(p, task.unet, x, t, qctx)
    else:
        params, vae_params, cond_params = loading.load_ldm_checkpoint(
            args.ckpt, task)

        def fp_apply_p(p, x, t, c=None, qctx=None, kv=None):
            return ldm_unet.apply(p, task.unet, x, t, context=c,
                                  qctx=qctx, kv_cache=kv)

    def fp_apply(x, t, c=None, qctx=None):
        return fp_apply_p(params, x, t, c, qctx)

    qargs = ptq.QuantArgs(
        wq=args.wq, aq=args.aq, softmax_a_bit=args.softmax_a_bit,
        use_aq=args.use_aq, w_sym=args.w_sym,
        running_stat=not args.no_running_stat,
        iters=args.cali_iters, cali_save_path=args.cali_save_path,
        seed=args.seed)
    adapter = ptq.build_adapter(task, qargs) if args.ptq else None

    n_per_t = args.cali_n or task.cali_n
    scale = args.scale if args.scale is not None else task.cfg_scale

    # ---- calibrate-then-exit (the reference --cali flow) ----
    if args.ptq and args.cali:
        ctx, uc = _get_context(task, args, cond_params, n_per_t) \
            if task.cond != "none" else (None, None)
        logger.info("harvesting calibration data (%d per step)", n_per_t)
        key, k = jax.random.split(key)
        w_cali, a_cali, cali_t = ptq.generate_cali_data(
            task, lambda x, t, c: fp_apply(x, t, c), k,
            n_per_t=n_per_t, context=ctx, uncond=uc, cfg_scale=scale,
            steps=args.timesteps, dpm_cfg=dpm_cfg)
        mesh = None
        if args.dp > 1:
            # the reference's --multi_gpu calibration
            # (sample_diffusion_ldm.py:512-524, txt2img.py:449-461):
            # recon loops shard samples over the mesh with pmean'd grads
            from .parallel.mesh import make_mesh
            mesh = make_mesh(dp=args.dp, tp=1)
            logger.info("calibration mesh: %s", dict(mesh.shape))
        if args.tp > 1:
            logger.warning("--tp is ignored during calibration "
                           "(reconstruction parallelism is dp-only, as "
                           "in the reference)")
        logger.info("calibrating -> %s", args.cali_save_path)
        key, k = jax.random.split(key)
        ptq.quantize_task(task, adapter, params, qargs, w_cali, a_cali,
                          cali_t=cali_t, key=k, mesh=mesh,
                          resume_dir=args.resume_dir)
        logger.info("calibration done")
        return 0

    # ---- build the (possibly quantized) per-step model fn ----
    if dpm_cfg and task.sampler != "dpm":
        logger.warning("--dpm_* flags are ignored: task %s uses the "
                       "%s sampler", task.name, task.sampler)
    sampler_fn, sample_t = ptq.make_schedule(task, steps=args.timesteps,
                                             eta=args.eta,
                                             dpm_cfg=dpm_cfg)
    wstate = astate = None
    group_of_step = None
    if args.ptq:
        assert args.cali_ckpt, "--cali_ckpt required with --ptq sampling"
        wstate, astate, meta = load_cali_model(args.cali_ckpt)
        if astate is not None and "cali_t" in meta:
            if sample_t is None:  # adaptive DPM: data-dependent times
                logger.warning("adaptive DPM-Solver has no static step "
                               "times; FSC uses calibration group 0 "
                               "for every eval")
            else:
                group_of_step = group_of_step_from_t(
                    np.asarray(meta["cali_t"]), np.asarray(sample_t))

    n = args.num_images
    ctx = uc = None
    if task.cond != "none":
        ctx, uc = _get_context(task, args, cond_params, args.batch)

    deployed = {}
    deploy_dtype = None
    if args.ptq and args.int_kernels:
        from .quant.deploy import specialize_maps
        if args.int4_serving and args.wq != 4:
            logger.warning("--int4-serving has no effect with --wq %d "
                           "(only 4-bit weights pack)", args.wq)
        deployed = deploy_weights(adapter.policy, params, wstate,
                                  int4_serving=args.int4_serving)
        res = (task.unet.resolution if task.family == "ddim"
               else task.unet.image_size)
        ex = (jnp.zeros((1, res, res, task.unet.in_channels)),
              jnp.zeros((1,), jnp.int32))
        if ctx is not None:
            ex = ex + (ctx[:1],)
        deployed = specialize_maps(adapter, params, deployed,
                                   example_args=ex, use_aq=args.use_aq)
        if args.deploy_dtype == "bfloat16":
            # fast-deploy: FP-fallback layers and glue ops run bf16
            # (the same dtype an FP TPU deployment would use); int8
            # correction math stays f32. float32 keeps the deployed
            # model bit-exact vs its fake-quant simulation.
            deploy_dtype = jnp.bfloat16
            from .quant.deploy import cast_fp_params
            params = cast_fp_params(params)

    # Model state crosses the jit boundary as one ARGUMENT pytree —
    # closing over concrete params would embed them as constants in the
    # compiled program (fatal for large UNets).
    bundle = {"params": params, "wstate": wstate or {},
              "astate": astate or {}, "deployed": deployed,
              "ctx": ctx, "uc": uc,
              "gos": None if group_of_step is None
              else jnp.asarray(group_of_step, jnp.int32)}

    from .quant.context import QuantCtx
    from .quant.fsc import slice_fsc

    # static-context cross-attn K/V cache: the context is constant over
    # the rollout, so its to_k/to_v projections (+ act quant / int GEMM)
    # execute once per prompt batch instead of once per sampler step
    # (the reference recomputes them every step, attention.py:176-193)
    bundle["kv"] = None
    if (task.family != "ddim" and ctx is not None and ctx.ndim == 3
            and task.unet.use_spatial_transformer
            and not args.no_kv_cache):
        c_in = jnp.concatenate([uc, ctx])
        q0 = None
        if args.ptq:
            ast0 = {}
            if args.use_aq and (astate or {}):
                g0 = 0 if group_of_step is None else int(group_of_step[0])
                ast0 = slice_fsc(astate, g0)
            if args.int_kernels:
                q0 = QuantCtx(adapter.policy, wstate={}, astate=ast0,
                              use_wq=True, use_aq=args.use_aq,
                              deploy=deployed, flash=True,
                              act_out_dtype=deploy_dtype)
            else:
                q0 = QuantCtx(adapter.policy, wstate=wstate or {},
                              astate=ast0, use_wq=True,
                              use_aq=args.use_aq, flash=True)
        bundle["kv"] = ldm_unet.build_cross_kv(params, task.unet, c_in,
                                               qctx=q0)

    def apply_q(b, x, t, c, step):
        if not args.ptq:
            return fp_apply_p(b["params"], x, t, c, kv=b["kv"])
        ast = {}
        if args.use_aq and b["astate"]:
            g = step if b["gos"] is None else b["gos"][step]
            ast = slice_fsc(b["astate"], g)
        if args.int_kernels:
            qctx = QuantCtx(adapter.policy, wstate={}, astate=ast,
                            use_wq=True, use_aq=args.use_aq,
                            deploy=b["deployed"], flash=True,
                            act_out_dtype=deploy_dtype)
        else:
            qctx = QuantCtx(adapter.policy, wstate=b["wstate"],
                            astate=ast, use_wq=True, use_aq=args.use_aq,
                            flash=True)
        return fp_apply_p(b["params"], x, t, c, qctx=qctx, kv=b["kv"])

    if task.cond != "none":
        def model_fn(b, x, t, step):
            # double-batched CFG (ddim.py:178-185)
            x_in = jnp.concatenate([x, x])
            t_in = jnp.concatenate([t, t])
            c_in = jnp.concatenate([b["uc"], b["ctx"]])
            e = apply_q(b, x_in, t_in, c_in, step)
            e_uc, e_c = jnp.split(e, 2)
            return e_uc + scale * (e_c - e_uc)
    else:
        def model_fn(b, x, t, step):
            return apply_q(b, x, t, None, step)

    t0 = time.time()
    if args.interpolation:
        logger.info("slerp interpolation (%d frames)", args.batch)
        sampling.sample_interpolation(
            task, sampler_fn,
            lambda x, t, s: model_fn(bundle, x, t, s),
            key=key, n_interp=args.batch,
            out_dir=os.path.join(args.out, "img"),
            vae_params=vae_params)
    else:
        mesh = None
        if args.dp > 1 or args.tp > 1:
            from .parallel.mesh import (make_mesh, replicate,
                                        shard_params_tp)
            # --tp alone must not also shard the batch: dp stays 1
            # unless explicitly requested (make_mesh infers dp from the
            # device count when passed None)
            mesh = make_mesh(dp=args.dp if args.dp > 1 else 1,
                             tp=args.tp)
            logger.info("sampling mesh: %s", dict(mesh.shape))
            bundle = replicate(mesh, bundle)
            if args.tp > 1:
                bundle["params"] = shard_params_tp(mesh, bundle["params"])
        logger.info("sampling %d images (batch %d)", n, args.batch)
        sampling.sample_fid(
            task, sampler_fn, model_fn, n_images=n,
            batch_size=args.batch, key=key,
            out_dir=os.path.join(args.out, "img"),
            vae_params=vae_params, bundle=bundle, mesh=mesh,
            npz_path=os.path.join(args.out, "samples.npz") if args.npz
            else None, watermark=args.watermark,
            grid_path=os.path.join(args.out, "grid.png") if args.grid
            else None)
    logger.info("done in %.1f min", (time.time() - t0) / 60)
    return 0


if __name__ == "__main__":
    sys.exit(main())
