#!/bin/bash
# Round-4 phase-1 serial TPU queue: establish the post-pscan record and
# fresh profile attribution, then probe the capacity axis.
#   1. bench.py — the driver metric at the committed tree (pscan landed)
#   2. unsharded per-line profile at the bench config (fresh line numbers)
#   3. capacity probe: does walker-steps/s rise with population?
#      pop 4e5 at mwalk 2^20 / cap 2^19 (same n_imp/r/min_wt)
cd "$(dirname "$0")/.."
LOG=/tmp/r4a_queue.log
run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $LOG
  timeout 5400 python "$@" >> $LOG 2>&1
  echo "=== rc=$?" >> $LOG
}

run bench.py
run tools/profile_walk.py --pop 200000 --g 2 --min-wt 0.5 --r-init 0.5 \
    --eps-var 1e-3 --n-psit 2000 --n-imp 20000 --mwalk-bits 19 \
    --cap-bits 18 --f32 --nstep 25 --outdir /tmp/trace_r4c
run tools/scan_walk.py --pop 400000 --g 2 --min-wt 0.5 --r-init 0.5 \
    --n-imp 20000 --mwalk-bits 20 --cap-bits 19 --f32 \
    --nblk 10 --nblk-eq 6 --nstep 25 --out .cache/scan_r4cap.jsonl

echo "QUEUE DONE $(date -u)" >> $LOG
