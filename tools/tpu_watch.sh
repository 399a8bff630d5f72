#!/bin/bash
# Wait for the TPU tunnel to come back, then run the r3h queue.
# Probe: backend init returns in seconds when the tunnel is up and
# hangs (internal ~25 min retry) when it is down, so a 120 s timeout
# cleanly separates the two.
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_watch.log
echo "watch start $(date -u)" > $LOG
while true; do
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
      >> $LOG 2>&1; then
    echo "TPU UP $(date -u)" >> $LOG
    bash tools/r3h_tpu_queue.sh
    echo "QUEUE EXIT rc=$? $(date -u)" >> $LOG
    break
  fi
  echo "tpu down $(date -u)" >> $LOG
  sleep 180
done
