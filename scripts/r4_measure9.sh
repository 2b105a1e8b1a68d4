#!/bin/bash
# Round-4 measurement batch 9: percentile int8 scales (quality sweep) +
# its fps cost check.
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r4_measurements9.txt}
cd "$(dirname "$0")/.."
log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "PSNR with clip_q=0.9995"
PSNR_CLIPQ=0.9995 timeout 3600 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "bench with clip_q=0.9995 (fps cost of the quantile)"
BENCH_SLAB_CLIPQ=0.9995 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "done $(date -u)"
