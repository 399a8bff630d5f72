#!/bin/bash
# Round-4 phase-3 serial TPU queue: A/B the i32 spawn-slot planes and the
# bf16 dense-projection table (both claimed value-identical on the v5e MXU
# - the bench e_mixed must come out BITWISE equal to the 8.70M run).
#   1. bench.py (now proj_bf16=True) - record attempt + the bitwise check
#   2. fresh per-line profile at the bench config with --proj-bf16
cd "$(dirname "$0")/.."
LOG=/tmp/r4f_queue.log
run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $LOG
  timeout 5400 python "$@" >> $LOG 2>&1
  echo "=== rc=$?" >> $LOG
}

run tools/probe_spawncap.py
run bench.py
run tools/profile_walk.py --pop 200000 --g 2 --min-wt 0.5 --r-init 0.5 \
    --eps-var 1e-3 --n-psit 2000 --n-imp 20000 --mwalk-bits 19 \
    --cap-bits 18 --f32 --proj-bf16 --nstep 25 --outdir /tmp/trace_r4f

echo "QUEUE DONE $(date -u)" >> $LOG
