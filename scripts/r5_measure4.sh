#!/bin/bash
# Round-5 measurement batch 4: the train-step rows r4 lost (empty driver
# logs) — best-known config (ALL knobs + MT2), sigma-separable, and the
# DS_FACE_CAP sweep. Goal: measured ms/step <= 600 (VERDICT r4 item 5).
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r5_measurements4.txt}
echo "=== r5 batch 4 START $(date -u) pid=$$ ===" >> "$OUT"
cd "$(dirname "$0")/.."
log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "distill step: ALL knobs + MT2 (r4 best-known, crashed mid-batch)"
DS_MT2=1 DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_INT8_PROBE=1 \
  DS_PALLAS_BUILD=select DS_BF16_LPIPS=1 DS_ITERS=3 \
  timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "distill step: ALL + MT2 + SIGMA_SEP"
DS_MT2=1 DS_SIGMA_SEP=1 DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_INT8_PROBE=1 \
  DS_PALLAS_BUILD=select DS_BF16_LPIPS=1 DS_ITERS=3 \
  timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "distill step: ALL + MT2 + SIGMA_SEP + face_cap 2^19"
DS_MT2=1 DS_SIGMA_SEP=1 DS_FACE_CAP=524288 DS_PALLAS_HEADS=1 \
  DS_BF16_SAMPLING=1 DS_INT8_PROBE=1 DS_PALLAS_BUILD=select DS_BF16_LPIPS=1 \
  DS_ITERS=3 timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "stage ablate: ALL + MT2 + SIGMA_SEP (attribute the frozen-G render)"
DS_STAGES=1 DS_MT2=1 DS_SIGMA_SEP=1 DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 \
  DS_INT8_PROBE=1 DS_PALLAS_BUILD=select \
  timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "frozen-render internal split (DS_STAGES=2, all knobs — r4 batch 6 lost)"
DS_STAGES=2 DS_MT2=1 DS_SIGMA_SEP=1 DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 \
  DS_INT8_PROBE=1 DS_PALLAS_BUILD=select \
  timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "done $(date -u)"
