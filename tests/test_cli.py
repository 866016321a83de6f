"""CLI end-to-end tests: synthesize torch-format checkpoints (the
reference's on-disk layouts), then run calibrate + quantized sampling
through the real command-line surface."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from tfmq_dm_tpu.configs.tasks import get_task
from tfmq_dm_tpu.models import clip_text, ddim_unet, ldm_unet, vae
from tfmq_dm_tpu.utils.torch_convert import export_state_dict

torch = pytest.importorskip("torch")

ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""),
           # CLI e2e tests spawn many cold subprocesses that compile
           # near-identical tiny programs; a shared on-disk compile
           # cache lets subprocess N reuse subprocess 1's compiles
           # (cuts the cali+sample pair from ~3.5 min to ~2 on CPU)
           JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
           JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1.0")


def _run(args, env=None):
    return subprocess.run(
        [sys.executable, "-m", "tfmq_dm_tpu.cli"] + args,
        capture_output=True, text=True, env=env or ENV, cwd="/root/repo",
        timeout=1200)


def _save_ddim_ckpt(path):
    task = get_task("tiny_ddim")
    params = ddim_unet.init_params(jax.random.PRNGKey(0), task.unet)
    sd = {k: torch.from_numpy(np.array(v)) for k, v in
          export_state_dict(params,
                            ddim_unet.iter_layers(task.unet)).items()}
    torch.save(sd, path)


def _save_ldm_ckpt(path, task_name="tiny_ldm"):
    task = get_task(task_name)
    u = ldm_unet.init_params(jax.random.PRNGKey(0), task.unet)
    v = vae.init_params(jax.random.PRNGKey(1), task.vae, encoder=False)
    sd = {}
    for k, t in export_state_dict(
            u, ldm_unet.iter_layers(task.unet)).items():
        sd[f"model.diffusion_model.{k}"] = torch.from_numpy(np.array(t))
    for k, t in export_state_dict(
            v, vae.iter_layers(task.vae, encoder=False)).items():
        sd[f"first_stage_model.{k}"] = torch.from_numpy(np.array(t))
    if task.cond == "class":
        emb = np.random.RandomState(0).randn(
            11, task.unet.context_dim).astype(np.float32)
        sd["cond_stage_model.embedding.weight"] = torch.from_numpy(emb)
    torch.save({"state_dict": sd}, path)


def test_cli_ddim_cali_and_sample(tmp_path):
    ckpt = str(tmp_path / "ddpm.pth")
    cali = str(tmp_path / "cali.npz")
    _save_ddim_ckpt(ckpt)
    r = _run(["--task", "tiny_ddim", "--ckpt", ckpt, "--ptq", "--cali",
              "--wq", "8", "--aq", "8", "--use_aq",
              "--cali_save_path", cali, "--cali_iters", "5",
              "--cali_n", "4"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(cali)

    out = str(tmp_path / "run")
    r = _run(["--task", "tiny_ddim", "--ckpt", ckpt, "--ptq",
              "--cali_ckpt", cali, "--use_aq", "-n", "4", "--batch", "2",
              "--out", out, "--npz"])
    assert r.returncode == 0, r.stderr[-3000:]
    imgs = os.listdir(os.path.join(out, "img"))
    assert len(imgs) == 4
    assert os.path.exists(os.path.join(out, "samples.npz"))
    # throughput was logged (reference parity: sample_diffusion_ldm:148)
    assert "imgs/s" in r.stderr


@pytest.mark.slow
def test_cli_ddim_int_kernels(tmp_path):
    ckpt = str(tmp_path / "ddpm.pth")
    cali = str(tmp_path / "cali.npz")
    _save_ddim_ckpt(ckpt)
    r = _run(["--task", "tiny_ddim", "--ckpt", ckpt, "--ptq", "--cali",
              "--wq", "8", "--aq", "8", "--use_aq",
              "--cali_save_path", cali, "--cali_iters", "2",
              "--cali_n", "4"])
    assert r.returncode == 0, r.stderr[-3000:]
    out = str(tmp_path / "runq")
    r = _run(["--task", "tiny_ddim", "--ckpt", ckpt, "--ptq",
              "--cali_ckpt", cali, "--use_aq", "--int-kernels",
              "-n", "2", "--batch", "2", "--out", out])
    assert r.returncode == 0, r.stderr[-3000:]
    assert len(os.listdir(os.path.join(out, "img"))) == 2


def test_cli_ldm_fp_sampling(tmp_path):
    ckpt = str(tmp_path / "ldm.ckpt")
    _save_ldm_ckpt(ckpt)
    out = str(tmp_path / "run")
    r = _run(["--task", "tiny_ldm", "--ckpt", ckpt, "-n", "2",
              "--batch", "2", "--out", out])
    assert r.returncode == 0, r.stderr[-3000:]
    assert len(os.listdir(os.path.join(out, "img"))) == 2


@pytest.mark.slow
def test_cli_class_cond_cali_and_sample(tmp_path):
    ckpt = str(tmp_path / "cin.ckpt")
    _save_ldm_ckpt(ckpt, "tiny_cin")
    cali = str(tmp_path / "cali.npz")
    r = _run(["--task", "tiny_cin", "--ckpt", ckpt, "--ptq", "--cali",
              "--wq", "8", "--aq", "8", "--use_aq",
              "--cali_save_path", cali, "--cali_iters", "2",
              "--cali_n", "2", "--classes", "0,1"])
    assert r.returncode == 0, r.stderr[-3000:]
    out = str(tmp_path / "run")
    r = _run(["--task", "tiny_cin", "--ckpt", ckpt, "--ptq",
              "--cali_ckpt", cali, "--use_aq", "-n", "2", "--batch", "2",
              "--classes", "0,1", "--out", out])
    assert r.returncode == 0, r.stderr[-3000:]
    assert len(os.listdir(os.path.join(out, "img"))) == 2


def test_cli_dp_sampling(tmp_path):
    """--dp N shards each sampling batch across a device mesh
    (pipelines/sampling.sample_fid mesh path) through the real CLI."""
    ckpt = str(tmp_path / "ddpm.pth")
    _save_ddim_ckpt(ckpt)
    out = str(tmp_path / "rundp")
    env = dict(ENV, XLA_FLAGS="--xla_force_host_platform_device_count=4")
    r = _run(["--task", "tiny_ddim", "--ckpt", ckpt,
              "-n", "4", "--batch", "4", "--dp", "4", "--out", out], env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "sampling mesh" in r.stderr
    assert len(os.listdir(os.path.join(out, "img"))) == 4


def _save_tiny_sd_ckpt(path):
    task = get_task("tiny_sd")
    u = ldm_unet.init_params(jax.random.PRNGKey(0), task.unet)
    v = vae.init_params(jax.random.PRNGKey(1), task.vae, encoder=False)
    c = clip_text.init_params(jax.random.PRNGKey(2), task.clip)
    sd = {}
    for k, t in export_state_dict(
            u, ldm_unet.iter_layers(task.unet)).items():
        sd[f"model.diffusion_model.{k}"] = torch.from_numpy(np.array(t))
    for k, t in export_state_dict(
            v, vae.iter_layers(task.vae, encoder=False)).items():
        sd[f"first_stage_model.{k}"] = torch.from_numpy(np.array(t))
    for k, t in export_state_dict(
            c, clip_text.iter_layers(task.clip)).items():
        sd[f"cond_stage_model.transformer.{k}"] = \
            torch.from_numpy(np.array(t))
    torch.save({"state_dict": sd}, path)


def _save_tiny_bert_ckpt(path):
    from tfmq_dm_tpu.models import bert_text
    task = get_task("tiny_bert")
    u = ldm_unet.init_params(jax.random.PRNGKey(0), task.unet)
    v = vae.init_params(jax.random.PRNGKey(1), task.vae, encoder=False)
    c = bert_text.init_params(jax.random.PRNGKey(2), task.bert)
    sd = {}
    for k, t in export_state_dict(
            u, ldm_unet.iter_layers(task.unet)).items():
        sd[f"model.diffusion_model.{k}"] = torch.from_numpy(np.array(t))
    for k, t in export_state_dict(
            v, vae.iter_layers(task.vae, encoder=False)).items():
        sd[f"first_stage_model.{k}"] = torch.from_numpy(np.array(t))
    for k, t in export_state_dict(
            c, bert_text.iter_layers(task.bert)).items():
        sd[f"cond_stage_model.transformer.{k}"] = \
            torch.from_numpy(np.array(t))
    torch.save({"state_dict": sd}, path)


def test_cli_bert_text_sampling(tmp_path):
    """BERT-conditioned LDM text2img family (BERTEmbedder conditioning,
    modules.py:80-103) through the CLI: FP CFG sampling with the stub
    tokenizer."""
    ckpt = str(tmp_path / "ldm_t2i.ckpt")
    _save_tiny_bert_ckpt(ckpt)
    out = str(tmp_path / "run")
    r = _run(["--task", "tiny_bert", "--ckpt", ckpt, "-n", "2",
              "--batch", "2", "--prompt", "a painting of a fox",
              "--out", out])
    assert r.returncode == 0, r.stderr[-3000:]
    assert len(os.listdir(os.path.join(out, "img"))) == 2


@pytest.mark.slow
def test_cli_sd_text_cali_and_sample(tmp_path):
    """SD-shaped end to end: tiny text-conditioned task through the CLI
    (stub tokenizer), exercising PLMS + CFG + FSC calibration, then
    quantized sampling with --int-kernels, --grid and --watermark (the
    txt2img.py flag surface)."""
    ckpt = str(tmp_path / "sd.ckpt")
    cali = str(tmp_path / "cali.npz")
    _save_tiny_sd_ckpt(ckpt)
    r = _run(["--task", "tiny_sd", "--ckpt", ckpt, "--ptq", "--cali",
              "--wq", "8", "--aq", "8", "--use_aq",
              "--cali_save_path", cali, "--cali_iters", "2",
              "--cali_n", "2", "--prompt", "a photo of a test"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(cali)

    out = str(tmp_path / "run")
    r = _run(["--task", "tiny_sd", "--ckpt", ckpt, "--ptq",
              "--cali_ckpt", cali, "--use_aq", "--int-kernels",
              "-n", "2", "--batch", "2", "--scale", "7.5",
              "--prompt", "a photo of a test", "--grid", "--watermark",
              "--out", out])
    assert r.returncode == 0, r.stderr[-3000:]
    assert len(os.listdir(os.path.join(out, "img"))) == 2
    assert os.path.exists(os.path.join(out, "grid.png"))


@pytest.mark.slow
def test_cli_dp_calibration(tmp_path):
    """--dp N during --cali runs mesh-sharded reconstruction (the
    reference's --multi_gpu calibration) through the real CLI, and the
    artifact samples correctly afterwards."""
    ckpt = str(tmp_path / "ddpm.pth")
    cali = str(tmp_path / "cali.npz")
    _save_ddim_ckpt(ckpt)
    env = dict(ENV, XLA_FLAGS="--xla_force_host_platform_device_count=4")
    r = _run(["--task", "tiny_ddim", "--ckpt", ckpt, "--ptq", "--cali",
              "--wq", "8", "--aq", "8", "--use_aq",
              "--cali_save_path", cali, "--cali_iters", "4",
              "--cali_n", "4", "--dp", "4"], env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "calibration mesh" in r.stderr
    assert os.path.exists(cali)
    out = str(tmp_path / "run")
    r = _run(["--task", "tiny_ddim", "--ckpt", ckpt, "--ptq",
              "--cali_ckpt", cali, "--use_aq", "-n", "2", "--batch", "2",
              "--out", out])
    assert r.returncode == 0, r.stderr[-3000:]
    assert len(os.listdir(os.path.join(out, "img"))) == 2
