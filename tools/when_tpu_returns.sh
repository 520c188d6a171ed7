#!/bin/bash
# Waits for the axon tunnel to come back, then runs the queued TPU
# measurements sequentially (single-client tunnel — nothing else may
# touch the TPU while this runs):
#   1. NCC microbench (validates + times the two-phase/paired-chunk/
#      hoisted-extraction kernel)
#   2. bench.py (headline numbers)
#   3. solve profile (stage-level breakdown)
#   4. fusion coherent-sampler microbench
# Logs to /tmp/tpu_queue.log; touches /tmp/tpu_queue.DONE when finished.
set -u
cd /root/repo
LOG=/tmp/tpu_queue.log
: > "$LOG"
# raise the inner probe timeout above the outer one so failed attempts
# still log a line (equal timeouts let the outer kill win silently)
echo "[$(date +%H:%M:%S)] waiting for tunnel" >> "$LOG"
while true; do
  if timeout 200 python tools/tpu_probe.py --attempts 1 --interval 1 --timeout 180 >> "$LOG" 2>&1; then
    echo "[$(date +%H:%M:%S)] tunnel is UP" >> "$LOG"
    break
  fi
  sleep 180
done
echo "[$(date +%H:%M:%S)] microbench (new kernel)" >> "$LOG"
timeout 1800 python tools/ncc_microbench.py >> "$LOG" 2>&1
rc=$?; echo "[$(date +%H:%M:%S)] microbench rc=$rc" >> "$LOG"
echo "[$(date +%H:%M:%S)] bench.py" >> "$LOG"
timeout 3000 python bench.py >> "$LOG" 2>&1
rc=$?; echo "[$(date +%H:%M:%S)] bench rc=$rc" >> "$LOG"
echo "[$(date +%H:%M:%S)] solve_profile" >> "$LOG"
timeout 1800 python tools/solve_profile.py >> "$LOG" 2>&1
rc=$?; echo "[$(date +%H:%M:%S)] solve_profile rc=$rc" >> "$LOG"
echo "[$(date +%H:%M:%S)] sample_microbench" >> "$LOG"
timeout 1800 python tools/sample_microbench.py >> "$LOG" 2>&1
rc=$?; echo "[$(date +%H:%M:%S)] sample_microbench rc=$rc" >> "$LOG"
touch /tmp/tpu_queue.DONE
