#!/bin/bash
# Round-4 measurement batch 5: blend tile-capacity sweep (exploratory;
# quality gate = the PSNR row must stay >= 39 dB before any default flip)
# + overflow-budget trim.
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r4_measurements5.txt}
cd "$(dirname "$0")/.."

log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "bench tile_capacity=768"
BENCH_TILE_CAP=768 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench tile_capacity=640"
BENCH_TILE_CAP=640 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench overflow=2^16 (trim the overflow gather; watch n_dropped)"
BENCH_OVERFLOW=65536 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "done $(date -u)"
