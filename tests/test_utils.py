"""Tests for aux subsystems: metrics, prompts, run dirs, distributed
helpers, schedules."""

import json
import os

import numpy as np

from tfmq_dm_tpu.data import prompts as P
from tfmq_dm_tpu.parallel.distributed import is_main_process
from tfmq_dm_tpu.utils import metrics as M
from tfmq_dm_tpu.utils.runlog import setup_run_dir


def test_fid_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 16)
    mu, sig = f.mean(0), np.cov(f, rowvar=False)
    assert abs(M.fid_from_stats(mu, sig, mu, sig)) < 1e-6


def test_fid_increases_with_shift():
    rng = np.random.RandomState(1)
    f1 = rng.randn(500, 8)
    f2 = f1 + 2.0
    mu1, s1 = f1.mean(0), np.cov(f1, rowvar=False)
    mu2, s2 = f2.mean(0), np.cov(f2, rowvar=False)
    fid = M.fid_from_stats(mu1, s1, mu2, s2)
    assert abs(fid - 8 * 4.0) < 0.5  # ||shift||^2 = 8 * 2^2


def test_activation_stats_and_psnr():
    imgs = np.random.RandomState(2).rand(10, 4, 4, 3)
    mu, sig = M.activation_stats(imgs, lambda b: b.reshape(len(b), -1),
                                 batch_size=4)
    assert mu.shape == (48,) and sig.shape == (48, 48)
    assert M.psnr(imgs, imgs) == float("inf")
    assert M.sqnr_db(imgs, imgs + 1e-3) > 20


def test_coco_prompts(tmp_path):
    path = tmp_path / "captions.json"
    anns = {"annotations": [{"caption": f"cap {i}", "id": i}
                            for i in range(50)]}
    path.write_text(json.dumps(anns))
    ps = P.coco_prompts(str(path), num=8, seed=0)
    assert len(ps) == 8 and all(p.startswith("cap") for p in ps)
    # deterministic
    assert ps == P.coco_prompts(str(path), num=8, seed=0)


def test_prompt_batching(tmp_path):
    f = tmp_path / "p.txt"
    f.write_text("\n".join(f"p{i}" for i in range(5)))
    batches = P.prompts_for_eval(str(f), batch_size=2)
    assert [len(b) for b in batches] == [2, 2, 1]


def test_run_dir(tmp_path):
    d = setup_run_dir(str(tmp_path), config={"a": 1}, name="t")
    assert os.path.isdir(os.path.join(d, "img"))
    assert json.load(open(os.path.join(d, "config.json")))["a"] == 1


def test_main_process_single_host():
    assert is_main_process()
