#!/bin/bash
# Quality campaign: produce every row of docs/QUALITY.md's results table
# on the real TPU chip, committing one JSON artifact per row under runs/
# plus a per-unit recon-loss-curve npz under runs/logs/ (auditable
# convergence evidence).
#
# Budget notes (docs/QUALITY.md cites this script):
# - default recon iters 5000/unit and 64 cali samples/step; the
#   *_ref20k rows below run the reference's full budget (20000 iters,
#   256 samples — /root/reference/ddim/runners/diffusion.py:296-310)
#   on the same seed, so the budget cut is a measured A/B, not a claim.
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
run_gate () {  # run_gate <tag> <args...>; GATE_ITERS/GATE_NCALI override
  local tag=$1; shift
  local iters="${GATE_ITERS:-$ITERS}" ncali="${GATE_NCALI:-$NCALI}"
  local out="runs/quality_${tag}.json"
  if [ -s "$out" ]; then
    echo "=== quality_gate $tag: $out exists, skipping ==="
    return 0
  fi
  local attempt
  for attempt in 1 2 3 4 5 6 7 8; do
    # tee -a: a retry after a TPU crash must APPEND, not clobber the
    # per-unit loss records already in the log (round-3 advisor)
    echo "=== quality_gate $tag (attempt $attempt) ===" \
      | tee -a "runs/logs/gate_${tag}.log"
    if python scripts/quality_gate.py "$@" --iters "$iters" \
         --n-cali "$ncali" \
         --resume-dir "runs/resume_${tag}" \
         --curves "runs/logs/curves_${tag}.npz" \
         --json "$out" 2>&1 | tee -a "runs/logs/gate_${tag}.log"; then
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

# Conditioned row early (TIB-LDM, QK/SMV matmul quant, softmax-output
# quant, double-batched CFG end-to-end — reference path
# txt2img.py:394-488, quant_block.py:212-354); tiny_sd = CLIP-text CFG.
run_gate tiny_sd_w4a8 tiny_sd --wq 4 --fd 64

# Reference-budget A/B on the SAME seed (substantiates the 5k/64 cut)
# ahead of the cifar trio: a gate is atomic, and losing the A/B to the
# wall clock costs more than losing the last cifar row:
GATE_ITERS=20000 GATE_NCALI=256 \
  run_gate toy_w4a8_ref20k --ckpt "$CKPT" --wq 4 --fd 256

run_gate cifar10_w8a8  cifar10 --wq 8 --fd 128
run_gate cifar10_w4a8  cifar10 --wq 4 --fd 128
run_gate cifar10_w4a32 cifar10 --wq 4 --no-aq --fd 128

# Time-permitting tail: second conditioned row (cin256_v2 = the real
# ImageNet class-cond shape at CFG scale 3.0), then the cifar-scale
# reference-budget A/B.
run_gate cin256_w4a8 cin256_v2 --wq 4 --batch 8

GATE_ITERS=20000 GATE_NCALI=256 \
  run_gate cifar10_w4a8_ref20k cifar10 --wq 4 --fd 128

echo "campaign done (failed gates:${FAILED:-' none'})"
ls -la runs/quality_*.json
[ -z "$FAILED" ]
