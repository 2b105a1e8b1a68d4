#!/bin/bash
# Round-4 measurement batch 3: EG3D bilinear slab (VERDICT r4 item 6)
# + follow-ups. Run AFTER r4_measure2.sh.
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r4_measurements3.txt}
cd "$(dirname "$0")/.."

log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "bench eg3d + bilinear slab (cold ctx cache)"
BENCH_VARIANT=eg3d timeout 3600 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench eg3d non-slab anchor (r2 sweep measured 25.242)"
BENCH_VARIANT=eg3d BENCH_SLAB=0 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "done $(date -u)"
