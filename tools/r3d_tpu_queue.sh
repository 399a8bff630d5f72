#!/bin/bash
# Round-3 phase-4 serial TPU queue (post f64-fix, f32-state production mode):
#  1. population scaling: does walker-steps/s per chip improve at pop 5e5?
#  2-3. r_initiator scan (VERDICT r2 item 2) at the qualified config
#  4. r_initiator = 0 limit (direct initiator-bias A/B; noisier)
cd "$(dirname "$0")/.."
OUT=.cache/scan_r3d.jsonl
LOG=/tmp/r3d_queue.log
run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $LOG
  timeout 5400 python tools/scan_walk.py "$@" --out $OUT >> $LOG 2>&1
  echo "=== rc=$?" >> $LOG
}

run --pop 500000 --g 2 --min-wt 0.5 --mwalk 983040 --cap 655360 \
    --nstep 25 --nblk 4 --nblk-eq 10 --max-eq-ext 2 --quiet --f32
run --pop 200000 --g 2 --min-wt 0.5 --r-init 0.5 --mwalk 393216 --cap 262144 \
    --nstep 25 --nblk 16 --nblk-eq 12 --max-eq-ext 3 --quiet --f32
run --pop 200000 --g 2 --min-wt 0.5 --r-init 0.25 --mwalk 393216 --cap 262144 \
    --nstep 25 --nblk 16 --nblk-eq 12 --max-eq-ext 3 --quiet --f32
run --pop 200000 --g 2 --min-wt 0.5 --r-init 0.0 --mwalk 393216 --cap 262144 \
    --nstep 25 --nblk 16 --nblk-eq 12 --max-eq-ext 3 --quiet --f32

echo "QUEUE DONE $(date -u)" >> $LOG
