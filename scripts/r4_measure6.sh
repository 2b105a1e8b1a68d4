#!/bin/bash
# Round-4 measurement batch 6: frozen-render internal split (the 224 ms
# target-pipeline stage has never been attributed below the render call).
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r4_measurements6.txt}
cd "$(dirname "$0")/.."

log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "frozen-render split (DS_STAGES=2, all knobs)"
DS_STAGES=2 DS_MT2=1 DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_INT8_PROBE=1 DS_PALLAS_BUILD=select \
  timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "done $(date -u)"
