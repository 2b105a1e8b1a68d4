#!/bin/bash
# Round-4 measurement batch 7: separable sigma grid on hardware + the
# full train step with every measured-good knob stacked.
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r4_measurements7.txt}
cd "$(dirname "$0")/.."

log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "stage ablate: ALL + MT2 + SIGMA_SEP"
DS_STAGES=1 DS_MT2=1 DS_SIGMA_SEP=1 DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_INT8_PROBE=1 \
  DS_PALLAS_BUILD=select timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "distill step: ALL knobs + MT2 + SIGMA_SEP"
DS_MT2=1 DS_SIGMA_SEP=1 DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_INT8_PROBE=1 \
  DS_PALLAS_BUILD=select DS_BF16_LPIPS=1 DS_ITERS=3 \
  timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "done $(date -u)"

log "distill step: ALL + MT2 + SIGMA_SEP + face_cap 2^19"
DS_MT2=1 DS_SIGMA_SEP=1 DS_FACE_CAP=524288 DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 \
  DS_INT8_PROBE=1 DS_PALLAS_BUILD=select DS_BF16_LPIPS=1 DS_ITERS=3 \
  timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"
