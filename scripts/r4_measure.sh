#!/bin/bash
# Round-4 measurement batch: the distill-step hardware sweep, THIRD attempt
# (VERDICT r3 item 2). Fixes vs r3_measure.sh: stderr is KEPT in the log
# (the r3 rows died silently), timeouts raised to 3600 s (suspected cause:
# tunnel compile > 1800 s), bench_distill_step.py now uses a persistent
# compile cache, and rows are ordered by value so a partial run still banks
# the critical numbers (all-knobs row replaces the r3 incremental ladder).
# Usage: bash scripts/r4_measure.sh [outfile]
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r4_measurements.txt}
cd "$(dirname "$0")/.."

log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "distill step: pallas heads VJP"
DS_PALLAS_HEADS=1 DS_ITERS=3 timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "distill step: ALL knobs (pallas heads + bf16 sampling + int8 probe + select build + bf16 LPIPS)"
DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_INT8_PROBE=1 DS_PALLAS_BUILD=select DS_BF16_LPIPS=1 \
  DS_ITERS=3 timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "distill stage ablate (all knobs on)"
DS_STAGES=1 DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_INT8_PROBE=1 DS_PALLAS_BUILD=select \
  timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "distill step: baseline re-run (variance anchor vs r3's 823.5 ms)"
DS_ITERS=3 timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "distill step: bf16 probe variant (vs int8)"
DS_PALLAS_HEADS=1 DS_BF16_SAMPLING=1 DS_BF16_PROBE=1 DS_PALLAS_BUILD=select DS_BF16_LPIPS=1 \
  DS_ITERS=3 timeout 3600 $PY scripts/bench_distill_step.py 2>>"$OUT" | tee -a "$OUT"

log "done $(date -u)"
