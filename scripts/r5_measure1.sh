#!/bin/bash
# Round-5 measurement batch 1: the PSNR acceptance suite (BASELINE.md
# >=39 dB), multi-latent x multi-camera, absmax vs clip_q int8 scales.
# Launch protocol (VERDICT r4 item 2): write a start stamp BEFORE any
# work so an empty output file is itself a diagnosable signal.
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r5_measurements1.txt}
echo "=== r5 batch 1 START $(date -u) pid=$$ ===" >> "$OUT"
cd "$(dirname "$0")/.."
log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "PSNR suite absmax scales (4 latents x 3 cameras)"
timeout 5400 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "PSNR suite clip_q=0.9995"
PSNR_CLIPQ=0.9995 timeout 5400 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "done $(date -u)"
