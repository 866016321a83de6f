#!/bin/bash
# Quality campaign: produce every row of docs/QUALITY.md's results table
# on the real TPU chip, committing one JSON artifact per row under runs/.
#
# Budget notes (docs/QUALITY.md cites this script):
# - recon iters 5000/unit (ITERS=20000 for the reference's full budget,
#   /root/reference/ddim/runners/diffusion.py:296-304): per-unit losses
#   are converged well before 5k at these shapes (docs/QUALITY.md).
# - cali samples 64/step (reference: 256): the recon minibatch is 32, so
#   64 i.i.d. samples/step already gives >=2 disjoint batches per group;
#   raising to 256 quadruples harvest + capture cost for no measured
#   metric change on these model sizes (see runs/quality_*.json).
# No `set -e`: the shared tunnel TPU occasionally crashes mid-gate
# ("TPU worker process crashed or restarted"); each gate retries and the
# campaign resumes by skipping rows whose JSON artifact already exists.
set -u
cd "$(dirname "$0")/.."
# Prepend, never clobber: the TPU plugin lives on PYTHONPATH (e.g.
# /root/.axon_site); `PYTHONPATH=.` alone makes the axon backend
# unimportable and every gate dies with "Unable to initialize backend".
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
mkdir -p runs/logs

ITERS=${ITERS:-5000}
NCALI=${NCALI:-64}
CKPT=runs/toy_ddpm.npz

if [ ! -f "$CKPT" ]; then
  python scripts/train_toy.py --steps 8000 --out "$CKPT" \
    --sample runs 2>&1 | tee runs/logs/train_toy.log
fi

FAILED=""
run_gate () {  # run_gate <tag> <args...>
  local tag=$1; shift
  local out="runs/quality_${tag}.json"
  if [ -s "$out" ]; then
    echo "=== quality_gate $tag: $out exists, skipping ==="
    return 0
  fi
  local attempt
  for attempt in 1 2 3 4 5 6 7 8; do
    echo "=== quality_gate $tag (attempt $attempt) ==="
    if python scripts/quality_gate.py "$@" --iters "$ITERS" --n-cali "$NCALI" \
         --resume-dir "runs/resume_${tag}" \
         --json "$out" 2>&1 | tee "runs/logs/gate_${tag}.log"; then
      if [ -s "$out" ]; then
        rm -rf "runs/resume_${tag}"
        return 0
      fi
    fi
    rm -f "$out"
    echo "gate $tag attempt $attempt failed; sleeping 60s before retry"
    sleep 60
  done
  FAILED="$FAILED $tag"
  return 1
}

# Cheap trained-weight gates first (the toy model is ~6x faster per
# gate than the full cifar10 shape), so rows land earliest in a bounded
# wall clock; cifar10 (real BASELINE shape, random init) after.
run_gate toy_w4a8  --ckpt "$CKPT" --wq 4 --fd 256
run_gate toy_w8a8  --ckpt "$CKPT" --wq 8 --fd 256
run_gate toy_w4a32 --ckpt "$CKPT" --wq 4 --no-aq --fd 256

run_gate cifar10_w8a8  cifar10 --wq 8
run_gate cifar10_w4a8  cifar10 --wq 4
run_gate cifar10_w4a32 cifar10 --wq 4 --no-aq

echo "campaign done (failed gates:${FAILED:-' none'})"
ls -la runs/quality_*.json
[ -z "$FAILED" ]
