#!/bin/bash
# Round-3 phase-2 serial TPU queue: A/B the block-ELL projection (opt A)
# and the f32 walker-state mode (opt B) at the physics-qualified
# configuration (g=2, min_wt=0.5, 12k-det D space, pop 2e5).
cd "$(dirname "$0")/.."
OUT=.cache/scan_r3b.jsonl
LOG=/tmp/r3b_queue.log
run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $LOG
  timeout 4000 python tools/scan_walk.py "$@" --out $OUT >> $LOG 2>&1
  echo "=== rc=$?" >> $LOG
}

# throughput A/B at identical physics config (short: 4 measure blocks)
run --pop 200000 --g 2 --min-wt 0.5 --mwalk 393216 --cap 262144 \
    --nstep 25 --nblk 4 --nblk-eq 10 --max-eq-ext 2 --quiet
run --pop 200000 --g 2 --min-wt 0.5 --mwalk 393216 --cap 262144 \
    --nstep 25 --nblk 4 --nblk-eq 10 --max-eq-ext 2 --quiet --f32

# min_wt=1.0: halves the occupied-det count if bias stays low (longer:
# bias measurement run)
run --pop 200000 --g 2 --min-wt 1.0 --mwalk 262144 --cap 196608 \
    --nstep 25 --nblk 16 --nblk-eq 12 --max-eq-ext 3 --quiet --f32

echo "QUEUE DONE $(date -u)" >> $LOG
