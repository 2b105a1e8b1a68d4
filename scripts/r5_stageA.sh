#!/bin/bash
# Round-5 stage A: the headline fps sweep (VERDICT r4 item 3: >=32 fps).
# Most-valuable rows first so a tunnel death still banks the headline.
# Results go into the repo (results/), not /tmp — reboots wiped the r4
# and early-r5 logs.
set -u
PY=/opt/venv/bin/python
OUT=${1:-/root/repo/results/r5_measurements3.txt}
mkdir -p "$(dirname "$OUT")"
echo "=== r5 stage A START $(date -u) pid=$$ ===" >> "$OUT"
cd "$(dirname "$0")/.."
log() { echo "=== $* === $(date -u +%H:%M:%S)" | tee -a "$OUT"; }

log "bench r5 anchor (defaults) + verbose slab stamps"
GGD_SLAB_VERBOSE=1 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench rgb10 + tile_capacity=768 (combined best candidate)"
BENCH_RGB10=1 BENCH_TILE_CAP=768 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench rgb10 payloads (packed_v3: 4 sort words)"
BENCH_RGB10=1 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench tile_capacity=768"
BENCH_TILE_CAP=768 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench mxu_power (quadratic-basis MXU falloff in the blend)"
BENCH_MXU_POWER=1 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench rgb10 + mxu_power + tile_cap 768 (full stack)"
BENCH_RGB10=1 BENCH_MXU_POWER=1 BENCH_TILE_CAP=768 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench tile_capacity=640"
BENCH_TILE_CAP=640 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench overflow=2^16 (watch n_dropped)"
BENCH_OVERFLOW=65536 timeout 3000 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "bench eg3d bilinear slab (r4 crash retry; fallback now non-fatal)"
GGD_SLAB_VERBOSE=1 BENCH_VARIANT=eg3d timeout 3600 $PY bench.py 2>>"$OUT" | tee -a "$OUT"

log "stage A done $(date -u)"
