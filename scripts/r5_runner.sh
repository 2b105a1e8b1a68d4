#!/bin/bash
# Round-5 serial measurement runner: wait for any in-flight TPU job,
# probe the axon tunnel until it responds, then run the queued batches
# back to back (one TPU job at a time). Every stage writes a stamp, so
# an empty log is itself diagnosable (VERDICT r4 item 2).
set -u
PY=/opt/venv/bin/python
LOG=${1:-/tmp/r5_runner.log}
cd "$(dirname "$0")/.."
stamp() { echo "=== runner: $* === $(date -u)" | tee -a "$LOG"; }

stamp "start pid=$$"

# wait for any current psnr/bench job to exit (avoid tunnel contention)
while pgrep -x python >/dev/null 2>&1 && \
      ps -eo args | grep -E "^/opt/venv/bin/python (scripts/psnr_slab|bench|scripts/bench_distill)" >/dev/null; do
  sleep 60
done
stamp "no in-flight TPU job"

# probe until the tunnel answers (up to 8h)
for i in $(seq 1 96); do
  if timeout 120 $PY -c "import jax; jax.devices()" >/dev/null 2>&1; then
    stamp "tunnel up after $i probes"
    break
  fi
  stamp "tunnel probe $i failed"
  sleep 240
done

bash scripts/r5_measure3.sh /tmp/r5_measurements3.txt 2>&1 | tee -a "$LOG"
bash scripts/r5_measure4.sh /tmp/r5_measurements4.txt 2>&1 | tee -a "$LOG"
stamp "done"
