#!/bin/bash
# Round-4 phase-2 serial TPU queue: measure the C(T)-in-D estimator change
# (walk.py round-4: the per-walker C(T) index plane, fresh-det search, and
# estimator gather drop out of the step when every Psi_T det is in D).
#   1. bench.py — new record attempt at the driver metric
#   2. fresh per-line profile at the bench config (next-target attribution)
cd "$(dirname "$0")/.."
LOG=/tmp/r4e_queue.log
run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $LOG
  timeout 5400 python "$@" >> $LOG 2>&1
  echo "=== rc=$?" >> $LOG
}

run bench.py
run tools/profile_walk.py --pop 200000 --g 2 --min-wt 0.5 --r-init 0.5 \
    --eps-var 1e-3 --n-psit 2000 --n-imp 20000 --mwalk-bits 19 \
    --cap-bits 18 --f32 --nstep 25 --outdir /tmp/trace_r4e

echo "QUEUE DONE $(date -u)" >> $LOG
