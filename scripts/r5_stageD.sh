#!/bin/bash
# Round-5 stage D: final-defaults confirmation + the Mosaic-lowering
# attribution experiment. Stamps before work; results in results/.
set -u
PY=/opt/venv/bin/python
OUT=${1:-/root/repo/results/r5_measurements_stageD.txt}
mkdir -p "$(dirname "$OUT")"
echo "=== r5 stage D START $(date -u) pid=$$ ===" >> "$OUT"
cd "$(dirname "$0")/.."
log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "fps: FINAL defaults (tile640+overflow114688+rgb10+iters32) — driver preview"
GGD_SLAB_VERBOSE=1 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "fps: FINAL defaults REPEAT"
timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "fps: eg3d FINAL defaults"
BENCH_VARIANT=eg3d timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "PSNR suite at the SHIPPED defaults (2x2, slab + raster-isolated + LPIPS)"
PSNR_LATENTS=2 PSNR_CAMERAS=2 timeout 4500 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "Mosaic attribution: mid_anchor rung with GGD_PALLAS_INTERPRET=1"
GGD_PALLAS_INTERPRET=1 PSNR_ABLATE=1 PSNR_ABLATE_ONLY=mid_anchor \
  PSNR_LATENTS=1 PSNR_CAMERAS=1 \
  timeout 3600 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "stage D done $(date -u)"
