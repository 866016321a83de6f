#!/bin/bash
# Quality campaign: produce every row of docs/QUALITY.md's results table
# on the real TPU chip, committing one JSON artifact per row under runs/.
#
# Budget notes (docs/QUALITY.md cites this script):
# - recon iters 20000/unit = the reference's full budget
#   (/root/reference/ddim/runners/diffusion.py:296-304).
# - cali samples 64/step (reference: 256): the recon minibatch is 32, so
#   64 i.i.d. samples/step already gives >=2 disjoint batches per group;
#   raising to 256 quadruples harvest + capture cost for no measured
#   metric change on these model sizes (see runs/quality_*.json).
set -e
cd "$(dirname "$0")/.."
# Prepend, never clobber: the TPU plugin lives on PYTHONPATH (e.g.
# /root/.axon_site); `PYTHONPATH=.` alone makes the axon backend
# unimportable and every gate dies with "Unable to initialize backend".
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
mkdir -p runs/logs

ITERS=${ITERS:-20000}
NCALI=${NCALI:-64}
CKPT=runs/toy_ddpm.npz

if [ ! -f "$CKPT" ]; then
  python scripts/train_toy.py --steps 8000 --out "$CKPT" \
    --sample runs 2>&1 | tee runs/logs/train_toy.log
fi

run_gate () {  # run_gate <tag> <args...>
  local tag=$1; shift
  echo "=== quality_gate $tag ==="
  python scripts/quality_gate.py "$@" --iters "$ITERS" --n-cali "$NCALI" \
    --json "runs/quality_${tag}.json" 2>&1 | tee "runs/logs/gate_${tag}.log"
}

run_gate cifar10_w8a8  cifar10 --wq 8
run_gate cifar10_w4a8  cifar10 --wq 4
run_gate cifar10_w4a32 cifar10 --wq 4 --no-aq

run_gate toy_w8a8  --ckpt "$CKPT" --wq 8 --fd 256
run_gate toy_w4a8  --ckpt "$CKPT" --wq 4 --fd 256
run_gate toy_w4a32 --ckpt "$CKPT" --wq 4 --no-aq --fd 256

echo "campaign done:"
ls -la runs/quality_*.json
