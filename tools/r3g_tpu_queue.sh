#!/bin/bash
# Round-3 phase-7 serial TPU queue: sharded walk after the per-shard
# block-ELL D-projection + f32-state + fused-scan fixes, vs the 296.7
# ms/step unsharded reference at the same shapes.
cd "$(dirname "$0")/.."
LOG=/tmp/r3g_queue.log
run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $LOG
  timeout 5400 python "$@" >> $LOG 2>&1
  echo "=== rc=$?" >> $LOG
}

run tools/profile_walk.py --pop 200000 --g 2 --min-wt 0.5 --eps-var 1e-3 \
    --n-psit 2000 --n-imp 20000 --mwalk-bits 19 --cap-bits 18 --f32 \
    --sharded --steps-per-call 25 --nstep 25 --outdir /tmp/trace_sharded25
run tools/profile_walk.py --pop 200000 --g 2 --min-wt 0.5 --eps-var 1e-3 \
    --n-psit 2000 --n-imp 20000 --mwalk-bits 19 --cap-bits 18 --f32 \
    --sharded --steps-per-call 1 --nstep 25 --outdir /tmp/trace_sharded1b

echo "QUEUE DONE $(date -u)" >> $LOG
