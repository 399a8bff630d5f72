#!/bin/bash
# Round-5 walk throughput queue (VERDICT r4 item 1): pipelined baseline,
# cap_compact A/B at the bench shape, then the ledgered bench re-run.
# Each rung appends to .cache/scan_r5.jsonl with bias measured in-run.
set -u
cd /root/repo
OUT=.cache/scan_r5.jsonl
COMMON="--pop 2e5 --g 2 --min-wt 0.5 --r-init 0.5 --eps-var 1e-3 \
  --n-psit 2000 --n-imp 20000 --tau 2e-3 --mwalk 458752 --cap 262144 \
  --nstep 100 --nblk 12 --nblk-eq 12 --f32 --proj-bf16 --out $OUT"

run() {
  echo "=== rung: $* $(date -u) ==="
  timeout 4500 python tools/scan_walk.py $COMMON "$@"
  rc=$?
  echo "=== rc=$rc $(date -u) ==="
  if [ $rc -ne 0 ]; then
    echo "RUNG FAILED rc=$rc -- continuing to next" >&2
  fi
}

run                             # pipelined baseline
run --no-pipeline               # pipelining A/B (same seed, same trajectory)
run --cap-compact 196608        # compact 25% of spawn slots
run --cap-compact 163840        # compact 37.5%
