#!/bin/bash
# Round-3 serial TPU experiment queue (ONE job on the chip at a time;
# concurrent processes crash the axon tunnel).  Each run appends a JSON
# line to tools/../.cache/scan_r3.jsonl.
cd "$(dirname "$0")/.."
OUT=.cache/scan_r3.jsonl
LOG=/tmp/r3_queue.log
run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $LOG
  timeout 4000 python tools/scan_walk.py "$@" --out $OUT >> $LOG 2>&1
  echo "=== rc=$?" >> $LOG
}

# A/B: merge strategy at sea scale (short throughput runs)
run --pop 200000 --g 1 --min-wt 0.25 --mwalk 600000 --cap 524288 \
    --nstep 25 --nblk 4 --nblk-eq 10 --max-eq-ext 2 --quiet
run --pop 200000 --g 1 --min-wt 0.25 --mwalk 600000 --cap 524288 \
    --nstep 25 --nblk 4 --nblk-eq 10 --max-eq-ext 2 --quiet --two-level

# knob scans: min_wt / g tradeoffs (bias + throughput, medium runs)
run --pop 200000 --g 1 --min-wt 0.5 --mwalk 400000 --cap 262144 \
    --nstep 25 --nblk 16 --nblk-eq 14 --max-eq-ext 3 --quiet
run --pop 200000 --g 2 --min-wt 0.5 --mwalk 400000 --cap 262144 \
    --nstep 25 --nblk 16 --nblk-eq 14 --max-eq-ext 3 --quiet

echo "QUEUE DONE $(date -u)" >> $LOG
