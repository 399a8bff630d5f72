#!/bin/bash
# Round-4i serial TPU queue: the bias-vs-throughput FRONTIER (VERDICT r3
# item 2).  Rungs vary the deterministic-space size n_imp at the bench
# operating point (r_init=0.5, min_wt=0.5, pop 2e5, g=2, tau 2e-3, f32),
# runs sized so every bias carries a <=0.3 mHa blocking error
# (t_corr ~ 300 steps at r=0.5 => ~13k measured steps per rung; prior
# scans used 3k).  Bigger D spaces are the reference's own bias lever
# (do_walk.f90:2260-2330).  Trials come from tools/build_trials_r4.py
# (one HCI run per eps_var; 24k/48k cut from the eps_var=2e-4
# 87,868-det wavefunction).
cd "$(dirname "$0")/.."
LOG=/tmp/r4i_queue.log
OUT=.cache/scan_r4_frontier.jsonl

wait_for() {
  # bounded: abort the queue if the trial build never lands (ADVICE r4)
  local deadline=$(( $(date +%s) + 7200 ))
  while [ ! -f "$1" ]; do
    if [ "$(date +%s)" -ge "$deadline" ]; then
      echo "=== ABORT: $1 never appeared within 2h" >> $LOG
      exit 1
    fi
    sleep 30
  done
}

run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $LOG
  timeout 5400 python "$@" >> $LOG 2>&1
  local rc=$?
  echo "=== rc=$rc" >> $LOG
  if [ $rc -ne 0 ]; then
    echo "=== ABORT: rung failed (rc=$rc)" >> $LOG
    exit $rc
  fi
}

# rung 12k long first (its trial builds fastest: eps_var=1e-3 HCI);
# shrinks the bench rung's +-0.65 to ~0.3 for ladder power.  NOTE: the
# eps_var=2e-4 trial build may still be running on the host during this
# run - its walker_steps_per_sec is therefore contamination-prone (the
# r4h 12.47M solo record stands as the throughput of record for this
# rung); the BIAS and its error bar are host-load-independent.
wait_for .cache/c2_trial_e0.001_t2000_i12000.npz
run tools/scan_walk.py --pop 200000 --g 2 --min-wt 0.5 --r-init 0.5 \
    --eps-var 1e-3 --n-psit 2000 --n-imp 12000 --mwalk 458752 \
    --cap 262144 --f32 --proj-bf16 \
    --nstep 100 --nblk 130 --nblk-eq 12 --out $OUT

# r_initiator=1.0 long at 12k (r-ladder power: 2.05 +- 0.90 -> ~0.35)
run tools/scan_walk.py --pop 200000 --g 2 --min-wt 0.5 --r-init 1.0 \
    --eps-var 1e-3 --n-psit 2000 --n-imp 12000 --mwalk 458752 \
    --cap 262144 --f32 --proj-bf16 \
    --nstep 100 --nblk 130 --nblk-eq 12 --out $OUT


# rung 24k
wait_for .cache/c2_trial_e0.0002_t2000_i24000.npz
run tools/scan_walk.py --pop 200000 --g 2 --min-wt 0.5 --r-init 0.5 \
    --eps-var 2e-4 --n-psit 2000 --n-imp 24000 --mwalk 458752 \
    --cap 262144 --f32 --proj-bf16 --dense-proj-max 24576 \
    --nstep 100 --nblk 130 --nblk-eq 12 --out $OUT

# rung 48k ([48k,48k] bf16 dense projection = 4.6 GB streamed per step)
wait_for .cache/c2_trial_e0.0002_t2000_i48000.npz
run tools/scan_walk.py --pop 200000 --g 2 --min-wt 0.5 --r-init 0.5 \
    --eps-var 2e-4 --n-psit 2000 --n-imp 48000 --mwalk 458752 \
    --cap 262144 --f32 --proj-bf16 --dense-proj-max 49152 \
    --nstep 100 --nblk 130 --nblk-eq 12 --out $OUT

echo "QUEUE DONE $(date -u)" >> $LOG
