#!/bin/bash
# Round-4 measurement batch 8: PSNR suite incl. the raster-isolated
# identical-sets metric (BASELINE.md acceptance).
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r4_measurements8.txt}
cd "$(dirname "$0")/.."
log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "PSNR suite (raster-isolated + full-path)"
timeout 3600 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "done $(date -u)"
