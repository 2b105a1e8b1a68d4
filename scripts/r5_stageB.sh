#!/bin/bash
# Round-5 stage B: relaunch of the sweep that died at stage-A row 3
# (session crash). Most-valuable rows first so a tunnel death still
# banks the headline; every stage stamps BEFORE work (r4 lesson).
# Results land in the repo (results/), never /tmp.
set -u
PY=/opt/venv/bin/python
OUT=${1:-/root/repo/results/r5_measurements_stageB.txt}
mkdir -p "$(dirname "$OUT")"
echo "=== r5 stage B START $(date -u) pid=$$ ===" >> "$OUT"
cd "$(dirname "$0")/.."
log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

# --- headline fps (VERDICT item 3: >=32) ------------------------------
log "fps: rgb10 + mxu_power + tile_cap 768 (full stack, >=32 shot)"
BENCH_RGB10=1 BENCH_MXU_POWER=1 BENCH_TILE_CAP=768 \
  timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "fps: rgb10 + tile_cap 768 REPEAT (second-session evidence, was 31.577)"
BENCH_RGB10=1 BENCH_TILE_CAP=768 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "fps: warm-start anchor (caches hot; warm slab_build_s < 10 s ask)"
GGD_SLAB_VERBOSE=1 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "fps: mxu_power alone (ablation)"
BENCH_MXU_POWER=1 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

# --- train step (VERDICT item 5: <=600 ms) ----------------------------
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

# --- eg3d (VERDICT item 4: >=30) --------------------------------------
log "fps: eg3d bilinear slab (r4 crash retry)"
GGD_SLAB_VERBOSE=1 BENCH_VARIANT=eg3d timeout 3600 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

# --- quality buy-back (VERDICT item 1 tail: 38.1 -> 39) ----------------
log "PSNR ablate ladder (pins the 0.9 dB error source)"
PSNR_ABLATE=1 PSNR_LATENTS=2 PSNR_CAMERAS=2 \
  timeout 5400 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "PSNR with deg-9 poly GELU"
PSNR_GELU=poly PSNR_LATENTS=2 PSNR_CAMERAS=2 \
  timeout 5400 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "PSNR with f32 heads matmuls"
PSNR_HEADS_F32=1 PSNR_LATENTS=2 PSNR_CAMERAS=2 \
  timeout 5400 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "PSNR gate: tile_cap 768 + rgb10 + mxu_power (accept the fps config)"
PSNR_TILE_CAP=768 PSNR_RGB10=1 PSNR_MXU_POWER=1 PSNR_LATENTS=2 PSNR_CAMERAS=2 \
  timeout 5400 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

# --- remaining stage-A ablation rows -----------------------------------
log "fps: stage ablate rows (tile_cap 640, overflow 2^16, rgb10 alone)"
BENCH_TILE_CAP=640 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"
BENCH_OVERFLOW=65536 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"
BENCH_RGB10=1 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "distill stage ablate: ALL + MT2 + SIGMA_SEP (frozen-G attribution)"
DS_STAGES=1 DS_MT2=1 DS_SIGMA_SEP=1 DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 \
  DS_INT8_PROBE=1 DS_PALLAS_BUILD=select \
  timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "stage B done $(date -u)"
