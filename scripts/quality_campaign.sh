#!/bin/bash
# Quality campaign: produce every row of docs/QUALITY.md's results table
# on the real TPU chip, committing one JSON artifact per row under runs/
# plus a per-unit recon-loss-curve npz under runs/logs/ (auditable
# convergence evidence). Each finished row is git-committed IMMEDIATELY
# (rounds 3 and 4 both died mid-campaign with finished rows untracked).
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
CIFAR_CKPT=runs/cifar10_ddpm.npz

if [ ! -f "$CKPT" ]; then
  python scripts/train_toy.py --steps 8000 --out "$CKPT" \
    --sample runs 2>&1 | tee runs/logs/train_toy.log
fi
# trained weights at the PUBLISHED cifar10 architecture (closes the
# "trained x real shape" gap: every cifar10 row below quantizes a model
# that actually generates structured images at the BASELINE shape)
if [ ! -f "$CIFAR_CKPT" ]; then
  python scripts/train_toy.py --config cifar10 --steps 12000 \
    --out "$CIFAR_CKPT" --sample runs 2>&1 \
    | tee runs/logs/train_cifar10.log
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
        # commit the row NOW: a killed campaign must leave zero
        # completed-but-uncommitted rows (round-4 verdict item 6)
        git add "$out" "runs/logs/curves_${tag}.npz" \
          "runs/logs/gate_${tag}.log" 2>/dev/null
        git commit -q -m "Quality row ${tag}" -m "$(cat "$out")" || true
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

# Toy trio first: warm-cache rows (~15 min each) that validate the
# shared-FP-capture path end-to-end and carry full-precision proxy-FD
# (round-4 values saturated at 3 decimals and could not order settings).
run_gate toy_w4a8  --ckpt "$CKPT" --wq 4 --fd 256
run_gate toy_w8a8  --ckpt "$CKPT" --wq 8 --fd 256
run_gate toy_w4a32 --ckpt "$CKPT" --wq 4 --no-aq --fd 256

# Conditioned row (TIB-LDM, QK/SMV matmul quant, softmax-output quant,
# double-batched CFG end-to-end — reference path txt2img.py:394-488,
# quant_block.py:212-354); tiny_sd = CLIP-text CFG. --fd 128: 64
# samples cannot estimate a 64-dim covariance (round-4 advisor).
run_gate tiny_sd_w4a8 tiny_sd --wq 4 --fd 128

# Reference-budget A/B on the SAME seed (substantiates the 5k/64 cut)
# ahead of the cifar trio: a gate is atomic, and losing the A/B to the
# wall clock costs more than losing the last cifar row:
GATE_ITERS=20000 GATE_NCALI=256 \
  run_gate toy_w4a8_ref20k --ckpt "$CKPT" --wq 4 --fd 256

# Real BASELINE shape x TRAINED weights (the published cifar10
# architecture trained in-repo; structured samples, so quantization
# damage is visible in every metric including proxy-FD):
run_gate cifar10_w4a8  cifar10 --ckpt "$CIFAR_CKPT" --wq 4 --fd 128
run_gate cifar10_w8a8  cifar10 --ckpt "$CIFAR_CKPT" --wq 8 --fd 128
run_gate cifar10_w4a32 cifar10 --ckpt "$CIFAR_CKPT" --wq 4 --no-aq --fd 128

# Time-permitting tail: second conditioned row (cin256_v2 = the real
# ImageNet class-cond shape at CFG scale 3.0), then the cifar-scale
# reference-budget A/B.
run_gate cin256_w4a8 cin256_v2 --wq 4 --batch 8

GATE_ITERS=20000 GATE_NCALI=256 \
  run_gate cifar10_w4a8_ref20k cifar10 --ckpt "$CIFAR_CKPT" --wq 4 --fd 128

echo "campaign done (failed gates:${FAILED:-' none'})"
ls -la runs/quality_*.json
[ -z "$FAILED" ]
