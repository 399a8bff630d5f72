#!/bin/bash
# Round-3 phase-8 serial TPU queue: re-measure after the packed
# routing/merge scatters landed.
#   1. unsharded per-line profile at the qualified bench config
#      (r_initiator=0.5, 12k-det D via eps_var=1e-3/n_imp=20000)
#   2. sharded n_dev=1 profile at the same shapes (overhead vs 1)
#   3. bench.py (the driver metric) with the new merge
#   4. block-ELL Davidson A/B on the 88k-det variational H
cd "$(dirname "$0")/.."
LOG=/tmp/r3h_queue.log
run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $LOG
  timeout 5400 python "$@" >> $LOG 2>&1
  echo "=== rc=$?" >> $LOG
}

run tools/profile_walk.py --pop 200000 --g 2 --min-wt 0.5 --r-init 0.5 \
    --eps-var 1e-3 --n-psit 2000 --n-imp 20000 --mwalk-bits 19 \
    --cap-bits 18 --f32 --nstep 25 --outdir /tmp/trace_unsharded_r3h
run tools/profile_walk.py --pop 200000 --g 2 --min-wt 0.5 --r-init 0.5 \
    --eps-var 1e-3 --n-psit 2000 --n-imp 20000 --mwalk-bits 19 \
    --cap-bits 18 --f32 --sharded --steps-per-call 1 --nstep 25 \
    --outdir /tmp/trace_sharded_r3h
run bench.py
run tools/bench_variational_tpu.py --eps 2e-4

# 5.-6. multi-chip projection data: per-shard work at n_dev=N is one
# shard of a fixed 200k global population, i.e. the unsharded step at
# pop/N with MWALK/N, CAP/N.  Measured step time here + the routing
# overhead from step 2 gives the projected N-chip walker-steps/s
# (PERF_NOTES "multi-chip projection", VERDICT r2 item 4c).
run tools/profile_walk.py --pop 100000 --g 2 --min-wt 0.5 --r-init 0.5 \
    --eps-var 1e-3 --n-psit 2000 --n-imp 20000 --mwalk-bits 18 \
    --cap-bits 17 --f32 --nstep 25 --outdir /tmp/trace_halfshard_r3h
run tools/profile_walk.py --pop 50000 --g 2 --min-wt 0.5 --r-init 0.5 \
    --eps-var 1e-3 --n-psit 2000 --n-imp 20000 --mwalk-bits 17 \
    --cap-bits 16 --f32 --nstep 25 --outdir /tmp/trace_quartershard_r3h

echo "QUEUE DONE $(date -u)" >> $LOG
