"""Render the recon-budget A/B: default 5k-iters/64-samples rows vs
their same-seed `*_ref20k` full-reference-budget counterparts
(20,000 iters / 256 samples — /root/reference/ddim/runners/
diffusion.py:296-310). Keeps docs/QUALITY.md's budget paragraph
traceable to committed artifacts.

Usage: python scripts/budget_ab.py [tag ...]   (default: toy_w4a8)
Each tag needs runs/quality_<tag>.json and runs/quality_<tag>_ref20k.json.
"""

import json
import sys

KEYS = [("unet_sqnr_db_mean", "UNet SQNR mean (dB)"),
        ("unet_sqnr_db_min", "UNet SQNR min (dB)"),
        ("sample_psnr_db", "sample PSNR (dB)"),
        ("traj_sqnr_db", "traj SQNR (dB)"),
        ("proxy_fd_fp_vs_quant", "proxy FD fp<->q")]


def main():
    tags = sys.argv[1:] or ["toy_w4a8"]
    for tag in tags:
        with open(f"runs/quality_{tag}.json") as f:
            a = json.load(f)
        with open(f"runs/quality_{tag}_ref20k.json") as f:
            b = json.load(f)
        print(f"### {tag}: 5k/64 vs reference 20k/256 (same seed)\n")
        print("| metric | 5k iters / 64 per step | 20k iters / 256 "
              "per step | delta |")
        print("|---|---|---|---|")
        for k, label in KEYS:
            va, vb = a.get(k), b.get(k)
            if va is None or vb is None:
                continue
            if "fd" in k:
                print(f"| {label} | {va:.5f} | {vb:.5f} | "
                      f"{vb - va:+.5f} |")
            else:
                print(f"| {label} | {va} | {vb} | {vb - va:+.2f} |")
        print()


if __name__ == "__main__":
    main()
