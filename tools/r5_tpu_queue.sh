#!/bin/bash
# Round-5 walk A/B queue (VERDICT r4 item 1) - as actually run
# (2026-08-21, .cache/scan_r5.jsonl): pipelined baseline under host
# load, serial-dispatch A/B, cap_compact rungs, solo pipelined rerun.
# Findings: pipelining net-negative through the tunnel (34.8 vs 39.8
# gen/s wall, bit-identical trajectories); cap_compact net-negative
# (~20 steps/s in-block - the compaction scatters serialize).  Both
# defaults stay off; see PERF_NOTES "Round-5: walk A/B results".
set -u
cd "$(dirname "$0")/.."
OUT=.cache/scan_r5.jsonl
COMMON="--pop 2e5 --g 2 --min-wt 0.5 --r-init 0.5 --eps-var 1e-3 \
  --n-psit 2000 --n-imp 20000 --tau 2e-3 --mwalk 458752 --cap 262144 \
  --nstep 100 --nblk 12 --nblk-eq 12 --f32 --proj-bf16 --out $OUT"

run() {
  echo "=== rung: $* $(date -u) ==="
  timeout 4500 python tools/scan_walk.py $COMMON "$@"
  echo "=== rc=$? $(date -u) ==="
}

run                             # serial-dispatch baseline (default)
run --no-pipeline               # explicit serial (same program)
run --cap-compact 196608
run --cap-compact 163840
