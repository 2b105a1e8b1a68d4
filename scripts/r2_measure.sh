#!/bin/bash
# Round-2 measurement batch: run everything queued during the tunnel
# outage and tee to a log. Usage: bash scripts/r2_measure.sh [outfile]
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r2_measurements.txt}
cd "$(dirname "$0")/.."

log() { echo "=== $* ===" | tee -a "$OUT"; }

log "bench BENCH_FRAME_BATCH=4 (default: packed_v2 + int8 + stream)"
timeout 1800 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench BENCH_FRAME_BATCH=1 (per-frame)"
BENCH_FRAME_BATCH=1 timeout 1500 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench BENCH_FRAME_BATCH=8 (deeper backbone amortization)"
BENCH_ITERS=16 BENCH_FRAME_BATCH=8 timeout 1500 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench copies=1 overflow=2^20 (sort-row rebalance)"
BENCH_COPIES=1 BENCH_OVERFLOW=$((2**20)) timeout 1500 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench fused uint32 sort key"
BENCH_FUSED_KEY=1 timeout 1500 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench masked-select brick build (channel-duplicated source)"
BENCH_BRICK_SELECT=1 timeout 1500 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench all frame knobs combined (copies=1 + fused key + select + batch8)"
BENCH_COPIES=1 BENCH_OVERFLOW=$((2**20)) BENCH_FUSED_KEY=1 BENCH_BRICK_SELECT=1 \
  BENCH_ITERS=16 BENCH_FRAME_BATCH=8 timeout 1500 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench eg3d variant (BASELINE config #1; bf16 bilinear bricks)"
BENCH_VARIANT=eg3d timeout 1500 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "profile_ablate (packed path)"
PROF_STAGES=synth,table,table_q,sample,stagein,decode,fields,pairs,bin,bin_all,full \
  timeout 2400 $PY scripts/profile_ablate.py 2>/dev/null | tee -a "$OUT"

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
