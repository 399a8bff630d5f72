#!/bin/bash
# Round-4 frontier queue (VERDICT r3 item 2): bias-vs-throughput frontier
# over n_imp in {12k, 24k, 48k} at r_initiator 0.5, every rung run long
# enough for a <=0.3 mHa error bar (100 measured blocks x 25 steps vs the
# bench's 16).  The 24k/48k trials are cut from the saved eps_var=1e-4
# 187k-det wavefunction (tools/cut_trials.py); the dense MXU projection
# carries them via --proj-bf16 --dense-proj-max.
cd "$(dirname "$0")/.."
LOG=/tmp/r4g_queue.log
run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $LOG
  timeout 10800 python "$@" >> $LOG 2>&1
  echo "=== rc=$?" >> $LOG
}
need() {
  # refuse to start a scan whose trial cache is missing: scan_walk would
  # silently rebuild it with a full CPU HCI run at eps_var=1e-4 (hours)
  if [ ! -f ".cache/$1" ]; then echo "MISSING .cache/$1" >> $LOG; return 1; fi
}

COMMON="--pop 200000 --g 2 --min-wt 0.5 --tau 2e-3 --f32 --proj-bf16 \
  --mwalk 458752 --cap 262144 --nstep 25 --nblk 100 --nblk-eq 30 \
  --out .cache/frontier_r4.jsonl"

# 12k rung to <=0.3 mHa (existing eps_var=1e-3 trial, the bench trial)
run tools/scan_walk.py --eps-var 1e-3 --n-psit 2000 --n-imp 20000 \
    --r-init 0.5 $COMMON

need c2_trial_e0.0001_t2000_i24576.npz && \
run tools/scan_walk.py --eps-var 1e-4 --n-psit 2000 --n-imp 24576 \
    --r-init 0.5 --dense-proj-max 24576 $COMMON

need c2_trial_e0.0001_t2000_i49152.npz && \
run tools/scan_walk.py --eps-var 1e-4 --n-psit 2000 --n-imp 49152 \
    --r-init 0.5 --dense-proj-max 49152 $COMMON

# stretch: r=0.25 at the biggest D space (sub-mHa candidate)
need c2_trial_e0.0001_t2000_i49152.npz && \
run tools/scan_walk.py --eps-var 1e-4 --n-psit 2000 --n-imp 49152 \
    --r-init 0.25 --dense-proj-max 49152 $COMMON

echo "QUEUE DONE $(date -u)" >> $LOG
