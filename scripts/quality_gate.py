"""FP-vs-quantized quality gate: SQNR / PSNR numbers produced by this
repo on the BASELINE configs' model shapes.

No pretrained checkpoint is reachable in this zero-egress environment
(pipelines/ckpt_util.py registry is egress-gated), so real-FID parity
cannot be measured here; this harness quantifies quantization fidelity
instead — the numeric agreement between the calibrated quantized model
and its FP counterpart under the REAL pipeline (cali-data harvest ->
TIAR reconstruction -> FSC -> deployed int kernels -> full sampler
rollout on identical seeds):

- per-step UNet-output SQNR over the sampler trajectory (how faithfully
  the quantized net reproduces FP epsilon predictions);
- final-sample PSNR between quantized and FP rollouts.

With a checkpoint present, the same flags produce the numbers on real
weights, and utils/fid.fid_from_npz closes the loop to FID.

Usage: python scripts/quality_gate.py [task] [--wq N] [--iters N]
           [--n-cali N] [--batch N] [--json PATH]
"""

import argparse
import json
import logging
import sys

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s: %(message)s")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tfmq_dm_tpu.configs.tasks import get_task
from tfmq_dm_tpu.models import ddim_unet, ldm_unet
from tfmq_dm_tpu.pipelines import ptq
from tfmq_dm_tpu.quant.calibrate import cali_model
from tfmq_dm_tpu.quant.context import QuantCtx
from tfmq_dm_tpu.quant.fsc import slice_fsc
from tfmq_dm_tpu.quant.recon import ReconHP
from tfmq_dm_tpu.utils.metrics import psnr, sqnr_db


def _cond_setup(task, key, n):
    """(context, uncond) for conditioned tasks, from RANDOM-INIT
    encoders + deterministic stub-tokenized synthetic prompts (no
    checkpoint is reachable here; the point is mechanism fidelity of
    the conditioned quant pipeline, mirroring cli._get_context)."""
    import jax.numpy as jnp
    from tfmq_dm_tpu.models import clip_text
    if task.cond == "class":
        # ClassEmbedder table (reference: encoders/modules.py:21-33);
        # last row is the CFG unconditional class
        emb_dim = task.unet.context_dim
        table = 0.02 * jax.random.normal(key, (1001, emb_dim))
        y = jnp.arange(n, dtype=jnp.int32) % 1000
        return (clip_text.class_embed(table, y),
                clip_text.class_embed(table,
                                      jnp.full((n,), 1000, jnp.int32)))
    prompts = [f"a synthetic scene number {i}" for i in range(n)]
    if getattr(task, "bert", None) is not None:
        from tfmq_dm_tpu.models import bert_text
        bcfg = task.bert
        p = bert_text.init_params(key, bcfg)
        return (bert_text.apply(p, bcfg,
                                bert_text.stub_tokenize(prompts, bcfg)),
                bert_text.apply(p, bcfg,
                                bert_text.stub_tokenize([""] * n, bcfg)))
    ccfg = task.clip or clip_text.vit_l_14_config()
    p = clip_text.init_params(key, ccfg)
    return (clip_text.apply(p, ccfg,
                            clip_text.stub_tokenize(prompts, ccfg)),
            clip_text.apply(p, ccfg,
                            clip_text.stub_tokenize([""] * n, ccfg)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("task", nargs="?", default="cifar10")
    ap.add_argument("--wq", type=int, default=4)
    ap.add_argument("--aq", type=int, default=8)
    ap.add_argument("--iters", type=int, default=1000,
                    help="recon iters/unit (reference budget: 20000)")
    ap.add_argument("--n-cali", type=int, default=32,
                    help="cali samples per timestep (reference: 256)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--no-aq", action="store_true",
                    help="weight-only quantization (the w4a32 BASELINE "
                         "configs): no act quantizers, no FSC")
    ap.add_argument("--json", default=None)
    ap.add_argument("--curves", default=None,
                    help="persist per-unit recon loss traces (npz, "
                         "~200 points/unit) so convergence/budget "
                         "claims are auditable")
    ap.add_argument("--resume-dir", default=None,
                    help="per-unit recon checkpoints; a retry after a "
                         "TPU-worker crash resumes instead of "
                         "restarting (quant/recon.py resume_dir)")
    ap.add_argument("--ckpt", default=None,
                    help="trained ddim_unet params npz "
                         "(scripts/train_toy.py output); random init "
                         "otherwise")
    ap.add_argument("--fd", type=int, default=0,
                    help="also compute a proxy Frechet distance "
                         "(fixed random-init InceptionV3 features) "
                         "between N FP and N quantized samples — a "
                         "relative quality metric, NOT comparable to "
                         "published FIDs (those need the pt_inception "
                         "weights, utils/fid.py)")
    args = ap.parse_args()

    task = get_task(args.task)
    key = jax.random.PRNGKey(0)

    trained = None
    if args.ckpt:
        import dataclasses as dc
        from tfmq_dm_tpu.pipelines.training import load_params
        trained, meta = load_params(args.ckpt)
        assert meta.get("kind") == "ddim_unet", meta
        cfg = ddim_unet.DDIMUNetConfig(
            resolution=meta["resolution"], ch=meta["ch"],
            ch_mult=tuple(meta["ch_mult"]),
            num_res_blocks=meta["num_res_blocks"],
            attn_resolutions=tuple(meta["attn_resolutions"]),
            in_channels=meta.get("in_channels", 3))
        # Sample with the schedule the model was TRAINED on — never the
        # task default (a mismatch would silently corrupt every metric).
        sched = {k: meta[k] for k in
                 ("beta_schedule", "beta_start", "beta_end") if k in meta}
        task = dc.replace(task, unet=cfg,
                          num_timesteps=meta["timesteps"], **sched)
        assert task.family == "ddim", "--ckpt is a ddim_unet npz"

    # _apply takes params EXPLICITLY: the rollout/metric jits below pass
    # params/wstate/astate as arguments — closed-over arrays are baked
    # into the HLO as constants, and the weight-sized AdaRound alphas
    # blew past the remote-compile relay's request-size limit (HTTP 413)
    if task.family == "ddim":
        params = trained if trained is not None else \
            ddim_unet.init_params(jax.random.PRNGKey(7), task.unet)

        def _apply(p, x, t, c=None, qctx=None):
            return ddim_unet.apply(p, task.unet, x, t, qctx)
        res = task.unet.resolution
        chans = task.unet.in_channels
    else:
        params = ldm_unet.init_params(jax.random.PRNGKey(7), task.unet)

        def _apply(p, x, t, c=None, qctx=None):
            return ldm_unet.apply(p, task.unet, x, t, context=c,
                                  qctx=qctx)
        res = task.unet.image_size
        chans = task.unet.in_channels

    def fp_apply(x, t, c=None, qctx=None):
        return _apply(params, x, t, c, qctx)

    use_aq = not args.no_aq
    qargs = ptq.QuantArgs(wq=args.wq, aq=args.aq, use_aq=use_aq,
                          w_sym=True, iters=args.iters,
                          cali_save_path=None, seed=0)
    adapter = ptq.build_adapter(task, qargs)

    # cache the finished calibration next to the per-unit resume
    # checkpoints: a TPU-worker crash during the rollout/metric phases
    # below then skips both the harvest and recalibration on retry
    cali_art = None
    recon_stats = {}
    if args.resume_dir:
        import os
        cali_art = os.path.join(args.resume_dir, "cali_artifact.npz")
    key, kc, k_harvest, k_cali = jax.random.split(key, 4)
    if cali_art and os.path.exists(cali_art):
        from tfmq_dm_tpu.quant.calibrate import load_cali_model
        print(f"[{task.name}] loading cached calibration {cali_art}",
              file=sys.stderr)
        wstate, astate, _ = load_cali_model(cali_art)
    else:
        print(f"[{task.name}] harvesting cali data "
              f"({args.n_cali}/step)...", file=sys.stderr)
        cali_ctx = cali_uc = None
        scale = None
        if task.cond != "none":
            cali_ctx, cali_uc = _cond_setup(task, kc, args.n_cali)
            scale = task.cfg_scale
        w_cali, a_cali, _ = ptq.generate_cali_data(
            task, lambda x, t, c: fp_apply(x, t, c), k_harvest,
            n_per_t=args.n_cali, steps=args.steps,
            context=cali_ctx, uncond=cali_uc, cfg_scale=scale)

        print(f"[{task.name}] calibrating "
              f"w{args.wq}a{32 if args.no_aq else args.aq} "
              f"({args.iters} iters/unit)...", file=sys.stderr)
        hp = ReconHP(iters=args.iters, batch_size=min(task.recon_batch,
                                                      args.n_cali))

        curves = {}
        lg = logging.getLogger("gate")

        def log_cb(unit, losses):
            if losses is None:
                lg.info("recon %-24s resumed from checkpoint", unit)
                return
            arr = np.asarray(losses)
            # keep the TRUE final point: curves_summary.py reads c[-1]
            # as the deployable end loss, and plain ::step subsampling
            # generally drops it
            sub = arr[::max(1, len(arr) // 200)]
            if len(arr) and (len(arr) - 1) % max(1, len(arr) // 200):
                sub = np.append(sub, arr[-1])
            curves[unit] = sub.astype(np.float32)
            lg.info("recon %-24s loss %.6f -> %.6f", unit,
                    float(arr[0]), float(arr[-1]))

        wstate, astate = cali_model(adapter, params, w_cali, a_cali,
                                    hp=hp, use_aq=use_aq, key=k_cali,
                                    resume_dir=args.resume_dir,
                                    path=cali_art, log=log_cb,
                                    recon_stats=recon_stats)
        if args.curves and curves:
            np.savez(args.curves, **curves)
            lg.info("recon loss curves saved to %s", args.curves)

    # rollouts on identical latents/seed
    sampler_fn, _ = ptq.make_schedule(task, steps=args.steps)
    key, kx, ks = jax.random.split(key, 3)
    x0 = jax.random.normal(kx, (args.batch, res, res, chans))

    roll_ctx = roll_uc = None
    if task.cond != "none":
        key, kc2 = jax.random.split(key)
        roll_ctx, roll_uc = _cond_setup(task, kc2, args.batch)

    def _cfg(apply_once, x, t):
        # double-batched CFG, as in inference (cli.py / ddim.py:178-185)
        x_in = jnp.concatenate([x, x])
        t_in = jnp.concatenate([t, t])
        c_in = jnp.concatenate([roll_uc, roll_ctx])
        e_uc, e_c = jnp.split(apply_once(x_in, t_in, c_in), 2)
        return e_uc + scale * (e_c - e_uc)

    def fp_model_p(p, x, t, step):
        if roll_ctx is not None:
            return _cfg(lambda xi, ti, ci: _apply(p, xi, ti, ci), x, t)
        return _apply(p, x, t)

    def q_model_p(p, wst, ast_b, x, t, step):
        ast = slice_fsc(ast_b, step) if ast_b is not None else {}
        qctx = QuantCtx(adapter.policy, wstate=wst, astate=ast,
                        use_wq=True, use_aq=use_aq, flash=True)
        if roll_ctx is not None:
            return _cfg(lambda xi, ti, ci: _apply(p, xi, ti, ci,
                                                  qctx=qctx), x, t)
        return _apply(p, x, t, qctx=qctx)

    roll_fp_traj = jax.jit(lambda p, x, k: sampler_fn(
        lambda xx, tt, ss: fp_model_p(p, xx, tt, ss), x, k,
        collect="traj"))
    roll_q_traj = jax.jit(lambda p, w, a, x, k: sampler_fn(
        lambda xx, tt, ss: q_model_p(p, w, a, xx, tt, ss), x, k,
        collect="traj"))
    fp_last, (fp_xs, fp_ts) = roll_fp_traj(params, x0, ks)
    q_last, (q_xs, _) = roll_q_traj(params, wstate, astate, x0, ks)

    # per-step UNet-output SQNR at the FP trajectory points (isolates
    # the net's fidelity from trajectory drift); one scanned program,
    # FSC group sliced by the traced step index as in inference
    n_steps = int(np.asarray(fp_ts).shape[0])

    @jax.jit
    def eps_pairs(p, w, a, xs_all, ts_all):
        def one(_, inp):
            xs, ts, i = inp
            return 0, (fp_model_p(p, xs, ts, i),
                       q_model_p(p, w, a, xs, ts, i))
        _, pairs = jax.lax.scan(one, 0,
                                (xs_all, ts_all, jnp.arange(n_steps)))
        return pairs

    e_fp_all, e_q_all = eps_pairs(params, wstate, astate,
                                  jnp.asarray(fp_xs),
                                  jnp.asarray(fp_ts))
    e_fp_all = np.asarray(e_fp_all)
    e_q_all = np.asarray(e_q_all)
    sqnrs = [sqnr_db(e_fp_all[i], e_q_all[i]) for i in range(n_steps)]
    fp_img = np.clip(np.asarray(fp_last) * 0.5 + 0.5, 0, 1)
    q_img = np.clip(np.asarray(q_last) * 0.5 + 0.5, 0, 1)
    out = {
        "task": task.name,
        "setting": f"w{args.wq}a{32 if args.no_aq else args.aq}",
        "recon_iters": args.iters,
        "cali_per_step": args.n_cali,
        "unet_sqnr_db_mean": round(float(np.mean(sqnrs)), 2),
        "unet_sqnr_db_min": round(float(np.min(sqnrs)), 2),
        "sample_psnr_db": round(psnr(fp_img, q_img), 2),
        "traj_sqnr_db": round(sqnr_db(np.asarray(fp_xs),
                                      np.asarray(q_xs)), 2),
    }
    if trained is not None:
        out["weights"] = "trained:" + args.ckpt
    if recon_stats:
        kept_nearest = sorted(u for u, v in recon_stats.items()
                              if v.get("kept") == "nearest")
        out["recon_guard"] = {
            "units": len(recon_stats),
            "kept_trained": len(recon_stats) - len(kept_nearest),
            "kept_nearest": kept_nearest,
        }

    if args.fd:
        # proxy FD: distribution-space damage from quantization, in the
        # features of the FIXED shallow random extractor (seed 0,
        # utils/proxy_fd.py). Its null separation is demonstrated by
        # tests/test_proxy_fd.py (FD(X,X)==0, data-vs-noise >> resample
        # noise floor, monotone in corruption); NOT comparable to
        # published FIDs (those need pt_inception weights, utils/fid.py).
        from tfmq_dm_tpu.utils.metrics import (activation_stats,
                                               fid_from_stats)
        from tfmq_dm_tpu.utils.proxy_fd import make_proxy_extractor
        print(f"[{task.name}] proxy-FD over {args.fd} samples...",
              file=sys.stderr)
        ext = make_proxy_extractor(cin=chans, seed=0)
        roll_fp_j = jax.jit(lambda p, x, k: sampler_fn(
            lambda xx, tt, ss: fp_model_p(p, xx, tt, ss), x, k))
        roll_q_j = jax.jit(lambda p, w, a, x, k: sampler_fn(
            lambda xx, tt, ss: q_model_p(p, w, a, xx, tt, ss), x, k))
        roll_fp = lambda x, k: roll_fp_j(params, x, k)
        roll_q = lambda x, k: roll_q_j(params, wstate, astate, x, k)

        def sample_set(roll, k0):
            imgs = []
            k = k0
            for i in range(0, args.fd, args.batch):
                k, kx, ks2 = jax.random.split(k, 3)
                xi = jax.random.normal(kx,
                                       (args.batch, res, res, chans))
                last = roll(xi, ks2)
                if isinstance(last, tuple):
                    last = last[0]
                imgs.append(np.clip(np.asarray(last) * 0.5 + 0.5, 0, 1))
            return np.concatenate(imgs)[: args.fd]

        set_fp = sample_set(roll_fp, jax.random.PRNGKey(100))
        set_q = sample_set(roll_q, jax.random.PRNGKey(100))
        mu_f, s_f = activation_stats(set_fp, ext, args.batch)
        mu_q, s_q = activation_stats(set_q, ext, args.batch)
        # FULL precision in the JSON (round only when rendering): at 3
        # decimals w8a8/w4a8/w4a32 all collapsed to 0.000-0.002 and the
        # metric could not order settings (round-4 verdict)
        out["proxy_fd_fp_vs_quant"] = float(
            fid_from_stats(mu_f, s_f, mu_q, s_q))
        if trained is not None:
            from tfmq_dm_tpu.data.synthetic import blobs_batch
            data = np.clip(np.asarray(blobs_batch(
                jax.random.PRNGKey(5), args.fd, res, chans))
                * 0.5 + 0.5, 0, 1)
            mu_d, s_d = activation_stats(data, ext, args.batch)
            out["proxy_fd_data_vs_fp"] = float(
                fid_from_stats(mu_d, s_d, mu_f, s_f))
            out["proxy_fd_data_vs_quant"] = float(
                fid_from_stats(mu_d, s_d, mu_q, s_q))
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
