#!/bin/bash
# Round-4 measurement batch 4: confirm the new fused-key default on two
# separate runs (VERDICT item 1 variance-proofing), true-warm slab build
# breakdown, and the frame_batch=4 + slab one-time-compile gamble.
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r4_measurements4.txt}
cd "$(dirname "$0")/.."

log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "bench default (fused key now default; verbose warm build breakdown)"
GGD_SLAB_VERBOSE=1 timeout 3600 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench default run 2 (variance proof)"
timeout 2400 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench frame_batch=4 + slab (one-time compile gamble; cache persists)"
BENCH_FRAME_BATCH=4 BENCH_ITERS=12 timeout 5400 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "done $(date -u)"
