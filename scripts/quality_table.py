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
    task = d["task"]
    if weights.startswith("trained:"):
        ck = weights.split(":", 1)[1]
        weights = "trained (`%s`)" % ck
        # --ckpt replaces the task's unet config with the checkpoint's
        # embedded one (quality_gate.py), so a toy-topology row must not
        # render under the same task label as the published-architecture
        # cifar10 rows
        if "toy_ddpm" in ck and task == "cifar10":
            task = "cifar10 (toy topology)"

    def fmt(v):
        # artifacts carry FULL precision (the 3-decimal artifacts of
        # round 4 could not order w4a32 vs w4a8); round only here
        return v if v is None or not isinstance(v, float) \
            else float("%.3g" % v)

    fd = fmt(d.get("proxy_fd_fp_vs_quant"))
    fd_data = None
    if d.get("proxy_fd_data_vs_fp") is not None:
        fd_data = "%s / %s" % (fmt(d["proxy_fd_data_vs_fp"]),
                               fmt(d["proxy_fd_data_vs_quant"]))
    guard = d.get("recon_guard")
    if guard:
        guard_s = "%d/%d" % (guard["kept_trained"], guard["units"])
    else:
        guard_s = "—"
    return ("| {task} | {weights} | {setting} | {iters} | {ncali} | "
            "{sq_mean}/{sq_min} | {psnr} | {traj} | {fd} | {fd_data} | "
            "{guard} |").format(
        task=task, weights=weights, setting=d["setting"],
        iters=d["recon_iters"], ncali=d.get("cali_per_step", "—"),
        sq_mean=d["unet_sqnr_db_mean"], sq_min=d["unet_sqnr_db_min"],
        psnr=d["sample_psnr_db"], traj=d["traj_sqnr_db"],
        fd="—" if fd is None else fd,
        fd_data="—" if fd_data is None else fd_data, guard=guard_s)


_ORDER = ["cifar10_w4a32", "cifar10_w4a8", "cifar10_w8a8",
          "cifar10_w4a8_ref20k", "toy_w4a32", "toy_w4a8", "toy_w8a8",
          "toy_w4a8_ref20k", "tiny_sd_w4a8", "cin256_w4a8"]


def _key(p):
    tag = p.split("quality_", 1)[-1].rsplit(".json", 1)[0]
    return (_ORDER.index(tag) if tag in _ORDER else len(_ORDER), tag)


def main():
    paths = sys.argv[1:] or sorted(glob.glob("runs/quality_*.json"),
                                   key=_key)
    print("| task | weights | setting | recon iters | cali/step | "
          "UNet SQNR mean/min (dB) | sample PSNR (dB) | "
          "traj SQNR (dB) | proxy FD fp↔q | proxy FD data↔fp / data↔q | "
          "guard kept |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for p in paths:
        print(row(p))


if __name__ == "__main__":
    main()
