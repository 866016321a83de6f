#!/bin/bash
# Parallel per-file pytest for local iteration: runs each tests/*.py in
# its own process, N at a time (default: nproc/2). pytest-xdist is not
# in this image; per-file processes also isolate jit-cache growth.
# Usage: scripts/test_shard.sh [N_PARALLEL] [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
N=${1:-$(( $(nproc) / 2 ))}
[ "$N" -lt 1 ] && N=1   # nproc=1 boxes: sequential, never 0 (div-by-zero)
shift 2>/dev/null || true
mkdir -p /tmp/test_shards
fail=0
pids=()
files=(tests/test_*.py)
run_one() {
  local f=$1
  local log="/tmp/test_shards/$(basename "$f").log"
  python -m pytest "$f" -q "$@" >"$log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "FAIL $f (log: $log)"
    tail -5 "$log"
  else
    echo "ok   $f  $(tail -1 "$log")"
  fi
  return $rc
}
i=0
for f in "${files[@]}"; do
  run_one "$f" "$@" &
  pids+=($!)
  i=$((i+1))
  if (( i % N == 0 )); then
    for p in "${pids[@]}"; do wait "$p" || fail=1; done
    pids=()
  fi
done
for p in "${pids[@]}"; do wait "$p" || fail=1; done
exit $fail
