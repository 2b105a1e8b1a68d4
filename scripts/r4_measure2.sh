#!/bin/bash
# Round-4 measurement batch 2: frame-path work (VERDICT r4 items 1, 3, 7).
# Run AFTER r4_measure.sh (chip contention inflates everything ~5x).
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r4_measurements2.txt}
cd "$(dirname "$0")/.."

log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "bench default (r4 code; cold slab cache -> writes /tmp/slab_ctx_cache)"
timeout 3600 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench default again (warm slab cache — VERDICT item 4 acceptance)"
timeout 2400 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench copies=1 overflow=2^20 (raster-tail re-sweep on slab path)"
BENCH_COPIES=1 BENCH_OVERFLOW=1048576 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench fused uint32 sort key"
BENCH_FUSED_KEY=1 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench copies=1 overflow=2^20 + fused key"
BENCH_COPIES=1 BENCH_OVERFLOW=1048576 BENCH_FUSED_KEY=1 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "slab-vs-oracle PSNR (VERDICT item 7)"
timeout 3600 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"

log "marching tetrahedra two-stage: stage ablate (DS_MT2=1)"
DS_STAGES=1 DS_MT2=1 DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_INT8_PROBE=1 DS_PALLAS_BUILD=select \
  timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "distill step: ALL knobs + MT2"
DS_MT2=1 DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_INT8_PROBE=1 DS_PALLAS_BUILD=select DS_BF16_LPIPS=1 \
  DS_ITERS=3 timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "slab frame ablate (r4 stage split for PERFORMANCE.md)"
PROF_SLAB=1 PROF_STAGES=synth,slab_vol,decode,fields,pairs,bin,bin_all,full \
  timeout 3600 $PY scripts/profile_ablate.py 2>>"$OUT" | tee -a "$OUT"

log "done $(date -u)"
