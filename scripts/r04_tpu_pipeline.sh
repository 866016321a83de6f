#!/bin/bash
# Round-4 TPU evidence pipeline, strictly serialized on the one chip:
# 1. SD bench post-K/V-hoist (kv on + off A/B)  -> runs/bench_sd_r04*.json
# 2. full quality campaign                       -> runs/quality_*.json
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
mkdir -p runs/logs

echo "=== bench_sd (kv cache ON) $(date) ==="
python bench_sd.py 8 > runs/bench_sd_r04.json \
  2> runs/logs/bench_sd_r04.err && cat runs/bench_sd_r04.json
echo "=== bench_sd (kv cache OFF) $(date) ==="
python bench_sd.py 8 --no-kv-cache --skip-int4 \
  > runs/bench_sd_r04_nokv.json \
  2> runs/logs/bench_sd_r04_nokv.err && cat runs/bench_sd_r04_nokv.json

echo "=== quality campaign $(date) ==="
bash scripts/quality_campaign.sh
echo "=== pipeline done $(date) ==="
