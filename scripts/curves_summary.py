"""Summarize per-unit reconstruction-loss curves into a markdown table.

Each quality row commits `runs/logs/curves_<tag>.npz` (one ~200-point
pure-reconstruction-loss trace per unit, recorded by
scripts/quality_gate.py from the `rec` carry of quant/recon.py's scan).
This renders the convergence evidence QUALITY.md's budget claim rests
on (reference budget counterpart:
/root/reference/ddim/runners/diffusion.py:296-310).

Reading the shape: AdaRound traces dip early (soft continuous alphas
can express corrections a binary rounding cannot) and then rise as the
temperature decay binarizes the alphas — the END value is the
deployable loss, so the table reports start / soft minimum / end, and
`improved` counts units whose end beats their start. Whether the end
also beats plain nearest rounding is the do-no-harm guard's job
(`recon_guard` in the row's JSON artifact), not the curve's.

Usage: python scripts/curves_summary.py [curves_*.npz ...]
"""
import glob
import os
import sys

import numpy as np


def row(path):
    tag = os.path.basename(path)[len("curves_") : -len(".npz")]
    d = np.load(path)
    starts, mins, ends = [], [], []
    for k in d.files:
        c = np.asarray(d[k], dtype=np.float64)
        starts.append(c[0])
        mins.append(c.min())
        ends.append(c[-1])
    ratios = [e / max(s, 1e-12) for s, e in zip(starts, ends)]
    improved = sum(e < s for s, e in zip(starts, ends))
    return "| %s | %d | %d/%d | %.4g | %.4g | %.4g | %.3f |" % (
        tag,
        len(d.files),
        improved,
        len(d.files),
        float(np.median(starts)),
        float(np.median(mins)),
        float(np.median(ends)),
        float(np.median(ratios)),
    )


def main():
    paths = sys.argv[1:] or sorted(glob.glob("runs/logs/curves_*.npz"))
    print(
        "| row | units | end<start | median start | median soft min | "
        "median end | median end/start |"
    )
    print("|---|---|---|---|---|---|---|")
    for p in paths:
        print(row(p))


if __name__ == "__main__":
    main()
