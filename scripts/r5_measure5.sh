#!/bin/bash
# Round-5 measurement batch 5: quality buy-back ladder — which knob lifts
# the 38.1 dB full path over 39 and what each costs in fps. Run AFTER
# batch 2's ablate pins the error source; all rows here are independent.
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r5_measurements5.txt}
echo "=== r5 batch 5 START $(date -u) pid=$$ ===" >> "$OUT"
cd "$(dirname "$0")/.."
log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "PSNR with deg-9 poly GELU (1.2e-4 err vs poly6's 1.8e-3)"
PSNR_GELU=poly PSNR_LATENTS=2 PSNR_CAMERAS=2 \
  timeout 5400 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "PSNR with f32 heads matmuls"
PSNR_HEADS_F32=1 PSNR_LATENTS=2 PSNR_CAMERAS=2 \
  timeout 5400 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "PSNR with both (deg-9 GELU + f32 heads)"
PSNR_GELU=poly PSNR_HEADS_F32=1 PSNR_LATENTS=2 PSNR_CAMERAS=2 \
  timeout 5400 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "PSNR gate: tile_cap 768 + rgb10 + mxu_power (raster-isolated row is the acceptance)"
PSNR_TILE_CAP=768 PSNR_RGB10=1 PSNR_MXU_POWER=1 PSNR_LATENTS=2 PSNR_CAMERAS=2 \
  timeout 5400 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "PSNR gate: tile_cap 640 (deeper trim)"
PSNR_TILE_CAP=640 PSNR_LATENTS=2 PSNR_CAMERAS=2 \
  timeout 5400 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "fps cost: deg-9 GELU"
BENCH_GELU=poly timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "fps cost: f32 heads"
BENCH_HEADS_F32=1 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "done $(date -u)"
