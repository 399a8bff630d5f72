#!/bin/bash
# Round-4h serial TPU queue: first CLEAN (solo, no concurrent pytest —
# the r4f 8.61M record ran beside a full-suite run on this 1-vCPU box)
# bench with the r4h data-movement rewrites (cuckoo C(T) hash, top_k /
# stable-sort compactions, sorted-indices scatters).  The per-block
# energies must come out BITWISE equal to the r4f run (all rewrites are
# trajectory-preserving); then a fresh per-line profile at the bench
# shape.
cd "$(dirname "$0")/.."
LOG=/tmp/r4h_queue.log
run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $LOG
  timeout 5400 python "$@" >> $LOG 2>&1
  echo "=== rc=$?" >> $LOG
}

run bench.py
# same shape as the r4f profile (mwalk 2^19, cap 2^18) for line-by-line
# comparability
run tools/profile_walk.py --pop 200000 --g 2 --min-wt 0.5 --r-init 0.5 \
    --eps-var 1e-3 --n-psit 2000 --n-imp 20000 --mwalk-bits 19 \
    --cap-bits 18 --f32 --proj-bf16 --nstep 25 --outdir /tmp/trace_r4h

echo "QUEUE DONE $(date -u)" >> $LOG
