"""Quantitative acceptance gate: the calibrated quantized model must
reproduce the FP model's outputs above fixed SQNR/PSNR floors under the
real pipeline (harvest -> TIAR -> FSC -> sampler rollout on identical
seeds). This is the in-repo stand-in for FID parity while no pretrained
checkpoint is reachable (utils/fid.py closes the loop to real FID once
weights exist); thresholds are deliberately loose floors that catch
regressions in the calibration/deployment numerics, not image-quality
claims."""

import json
import os
import subprocess
import sys

import pytest

ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""))


@pytest.mark.slow
@pytest.mark.parametrize("wq,sqnr_floor", [(8, 18.0), (4, 12.0)])
def test_quality_gate_tiny_ddim(wq, sqnr_floor, tmp_path):
    out = str(tmp_path / "qg.json")
    r = subprocess.run(
        [sys.executable, "scripts/quality_gate.py", "tiny_ddim",
         "--wq", str(wq), "--iters", "100", "--n-cali", "8",
         "--batch", "4", "--json", out],
        capture_output=True, text=True, env=ENV, cwd="/root/repo",
        timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(out) as f:
        res = json.load(f)
    assert res["unet_sqnr_db_mean"] >= sqnr_floor, res
    assert res["sample_psnr_db"] >= 25.0, res
