#!/bin/bash
# Round-5 measurement batch 3: frame-path sweep — r5 anchor, blend
# tile-capacity trim, overflow trim, slab warm-start honest stamps, and
# the EG3D bilinear-slab retry (r4 crash diagnosis).
set -u
PY=/opt/venv/bin/python
OUT=${1:-/tmp/r5_measurements3.txt}
echo "=== r5 batch 3 START $(date -u) pid=$$ ===" >> "$OUT"
cd "$(dirname "$0")/.."
log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "PSNR error-source ablate (batch-2 retry if it died on the tunnel)"
if ! grep -q psnr_ablate /tmp/r5_measurements2.txt 2>/dev/null; then
  PSNR_ABLATE=1 timeout 5400 $PY scripts/psnr_slab.py 2>>"$OUT" | tee -a "$OUT"
fi

log "bench r5 anchor (defaults) + verbose slab stamps"
GGD_SLAB_VERBOSE=1 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench tile_capacity=768"
BENCH_TILE_CAP=768 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench tile_capacity=640"
BENCH_TILE_CAP=640 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench overflow=2^16 (watch n_dropped)"
BENCH_OVERFLOW=65536 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench rgb10 payloads (packed_v3: 4 sort words)"
BENCH_RGB10=1 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench rgb10 + tile_capacity=768 (combined best candidate)"
BENCH_RGB10=1 BENCH_TILE_CAP=768 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench mxu_power (quadratic-basis MXU falloff in the blend)"
BENCH_MXU_POWER=1 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench rgb10 + mxu_power + tile_cap 768 (full stack)"
BENCH_RGB10=1 BENCH_MXU_POWER=1 BENCH_TILE_CAP=768 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench eg3d bilinear slab (r4 crash retry; fallback now non-fatal)"
GGD_SLAB_VERBOSE=1 BENCH_VARIANT=eg3d timeout 3600 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "frame ablate r5 (slab, fused key, deployed binning)"
PROF_SLAB=1 timeout 3600 $PY scripts/profile_ablate.py 2>>"$OUT" | tee -a "$OUT"

log "frame ablate r5 + rgb10"
PROF_SLAB=1 PROF_RGB10=1 timeout 3600 $PY scripts/profile_ablate.py 2>>"$OUT" | tee -a "$OUT"

log "done $(date -u)"
