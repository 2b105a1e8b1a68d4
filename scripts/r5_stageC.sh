#!/bin/bash
# Round-5 stage C: post-default-flip validation + the >=32 second-session
# row + the rungs stage B couldn't reach. Stamps BEFORE work; results in
# results/ (never /tmp). Most valuable rows first.
set -u
PY=/opt/venv/bin/python
OUT=${1:-/root/repo/results/r5_measurements_stageC.txt}
mkdir -p "$(dirname "$OUT")"
echo "=== r5 stage C START $(date -u) pid=$$ ===" >> "$OUT"
cd "$(dirname "$0")/.."
log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

# --- driver preview: PLAIN DEFAULTS (what BENCH_r05.json will run) -----
log "fps: plain defaults (rgb10+tile768 flipped; driver preview) + warm stamps"
GGD_SLAB_VERBOSE=1 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

# --- >=32 second-session evidence + sweep (ONE process, shared ctx) ----
log "fps: tile_cap 640 (32.101 in stage B) + in-process sweep rows"
BENCH_TILE_CAP=640 \
  BENCH_SWEEP="tile_cap=704;tile_cap=576;tile_cap=640,copies=1,overflow=393216;tile_cap=640,copies=3;tile_cap=768;tile_cap=640,overflow=114688" \
  timeout 4500 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

# --- dispatch-amortization probe (iters 10 -> 32, same program) --------
log "fps: BENCH_ITERS=32 (per-call tunnel dispatch amortization probe)"
BENCH_ITERS=32 BENCH_TILE_CAP=640 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

# --- quality gate for tile_cap 640 before any default flip -------------
log "PSNR gate: tile_cap 640 + rgb10 (the 32-fps config)"
PSNR_TILE_CAP=640 PSNR_RGB10=1 PSNR_LATENTS=2 PSNR_CAMERAS=2 \
  timeout 4500 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

# --- eg3d with the flipped defaults (stage B row may straddle the flip) -
log "fps: eg3d bilinear slab, flipped defaults"
BENCH_VARIANT=eg3d timeout 3600 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

# --- PSNR ablate ladder rerun (f32_bricks VMEM OOM fixed) ---------------
log "PSNR ablate ladder rerun (remaining rungs: f32_bricks/heads_f32/xla_heads)"
PSNR_ABLATE=1 PSNR_LATENTS=1 PSNR_CAMERAS=1 \
  timeout 5400 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

# --- the new out-of-box train step (flipped CLI defaults, f32 probe) ----
log "distill step: out-of-box defaults (MT2+sigma_sep+pallas_heads, f32 probe)"
DS_MT2=1 DS_SIGMA_SEP=1 DS_PALLAS_HEADS=1 DS_ITERS=3 \
  timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "stage C done $(date -u)"
