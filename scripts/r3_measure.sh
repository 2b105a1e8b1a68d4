#!/bin/bash
# Round-3 measurement batch: the distill-step hardware sweep (VERDICT #3 —
# the r2 batch was cut off before these rows) + the round-3 frame knobs.
# Usage: bash scripts/r3_measure.sh [outfile]
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r3_measurements.txt}
cd "$(dirname "$0")/.."

log() { echo "=== $* ===" | tee -a "$OUT"; }

log "bench default (r3 defaults)"
timeout 1800 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench fused sampling (gather-fused heads kernel)"
BENCH_FUSED_SAMPLING=1 timeout 1500 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "distill step: baseline"
DS_ITERS=3 timeout 1800 $PY scripts/bench_distill_step.py 2>/dev/null | tee -a "$OUT"

log "distill step: pallas heads VJP"
DS_PALLAS_HEADS=1 DS_ITERS=3 timeout 1800 $PY scripts/bench_distill_step.py 2>/dev/null | tee -a "$OUT"

log "distill step: + bf16 sampling + bf16/pallas probe"
DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_BF16_PROBE=1 DS_PALLAS_BUILD=1 DS_ITERS=3 \
  timeout 1800 $PY scripts/bench_distill_step.py 2>/dev/null | tee -a "$OUT"

log "distill step: + bf16 LPIPS"
DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_BF16_PROBE=1 DS_PALLAS_BUILD=1 DS_BF16_LPIPS=1 \
  DS_ITERS=3 timeout 1800 $PY scripts/bench_distill_step.py 2>/dev/null | tee -a "$OUT"

log "distill step: int8 probe (replaces bf16 probe)"
DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_INT8_PROBE=1 DS_PALLAS_BUILD=1 DS_BF16_LPIPS=1 \
  DS_ITERS=3 timeout 1800 $PY scripts/bench_distill_step.py 2>/dev/null | tee -a "$OUT"

log "distill step: + masked-select probe build"
DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_INT8_PROBE=1 DS_PALLAS_BUILD=select DS_BF16_LPIPS=1 \
  DS_ITERS=3 timeout 1800 $PY scripts/bench_distill_step.py 2>/dev/null | tee -a "$OUT"

log "distill stage ablate (all knobs on)"
DS_STAGES=1 DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_INT8_PROBE=1 DS_PALLAS_BUILD=1 \
  timeout 2400 $PY scripts/bench_distill_step.py 2>/dev/null | tee -a "$OUT"

log "done $(date -u)"
