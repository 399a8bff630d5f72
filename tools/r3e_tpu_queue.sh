#!/bin/bash
# Round-3 phase-5 serial TPU queue (waits for r3d):
#  1. sharded walk program on the real chip at n_dev=1 (VERDICT 4b)
#  2-3. per-shard capacity scaling: 1/8- and 1/2-scale single-chip runs at
#       fixed per-walker physics (VERDICT 4c -> 8-chip projection)
#  4. device-resident Davidson COO/ELL A/B at the 88k-det scale (VERDICT 7)
cd "$(dirname "$0")/.."
LOG=/tmp/r3e_queue.log
while kill -0 "$(cat /tmp/r3d.pid 2>/dev/null)" 2>/dev/null; do sleep 20; done
run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $LOG
  timeout 5400 python "$@" >> $LOG 2>&1
  echo "=== rc=$?" >> $LOG
}

run tools/bench_sharded_tpu.py --steps 100 --eq-steps 250
run tools/scan_walk.py --pop 25000 --g 2 --min-wt 0.5 --mwalk 49152 \
    --cap 32768 --nstep 25 --nblk 4 --nblk-eq 10 --max-eq-ext 2 \
    --quiet --f32 --out .cache/scan_r3e.jsonl
run tools/scan_walk.py --pop 100000 --g 2 --min-wt 0.5 --mwalk 196608 \
    --cap 131072 --nstep 25 --nblk 4 --nblk-eq 10 --max-eq-ext 2 \
    --quiet --f32 --out .cache/scan_r3e.jsonl
run tools/bench_variational_tpu.py --eps 2e-4

echo "QUEUE DONE $(date -u)" >> $LOG
