"""Render docs/QUALITY.md results-table rows from runs/quality_*.json.

Keeps the documented numbers traceable to committed artifacts: every row
in QUALITY.md is generated from a JSON file produced by
scripts/quality_gate.py (driven by scripts/quality_campaign.sh) — never
hand-typed.

Usage: python scripts/quality_table.py [runs/quality_*.json ...]
"""

import glob
import json
import sys


def row(path):
    with open(path) as f:
        d = json.load(f)
    weights = d.get("weights", "random init")
    if weights.startswith("trained:"):
        weights = "trained (`%s`)" % weights.split(":", 1)[1]
    fd = d.get("proxy_fd_fp_vs_quant")
    return "| {task} | {weights} | {setting} | {iters} | {sq_mean}/{sq_min} | {psnr} | {traj} | {fd} |".format(
        task=d["task"], weights=weights, setting=d["setting"],
        iters=d["recon_iters"],
        sq_mean=d["unet_sqnr_db_mean"], sq_min=d["unet_sqnr_db_min"],
        psnr=d["sample_psnr_db"], traj=d["traj_sqnr_db"],
        fd="—" if fd is None else fd)


def main():
    paths = sys.argv[1:] or sorted(glob.glob("runs/quality_*.json"))
    print("| task | weights | setting | recon iters | "
          "UNet SQNR mean/min (dB) | sample PSNR (dB) | "
          "traj SQNR (dB) | proxy FD fp↔q |")
    print("|---|---|---|---|---|---|---|---|")
    for p in paths:
        print(row(p))


if __name__ == "__main__":
    main()
