#!/bin/bash
# Single-image PTI pipeline: W-space projection + generator fine-tuning,
# then an orbit video from the inverted latent — the role of the
# reference's gen_pti_script.sh (projector_withseg.py ->
# gen_videos_proj_withseg.py).
#
# Usage: bash scripts/pti_pipeline.sh <target.png> <outdir> [network.pkl] \
#            [extra invert flags, e.g. --smoke --force_cpu]
set -euo pipefail
PY=${PY:-/opt/venv/bin/python}
TARGET=${1:?target image}
OUT=${2:?output dir}
shift 2
PKL=""
if [ $# -ge 1 ] && [ "${1#--}" = "${1:-}" ]; then
  # third positional (possibly empty = "no pickle"): consume it
  PKL=$1
  shift
fi

PKL_FLAG=()
[ -n "$PKL" ] && PKL_FLAG=(--network_pkl "$PKL")

$PY -m gaussian_gan_decoder_tpu.apps.invert \
    --target "$TARGET" --outdir "$OUT/pti" "${PKL_FLAG[@]}" "$@"

# invert writes projected_w.npz + an orbax finetuned_generator snapshot;
# render the orbit from the fine-tuned copy when present, like the
# reference
FT_FLAG=()
[ -e "$OUT/pti/finetuned_generator" ] && FT_FLAG=(--finetuned "$OUT/pti/finetuned_generator")
CPU_FLAG=()
case " $* " in *" --force_cpu "*) CPU_FLAG=(--force_cpu);; esac

$PY -m gaussian_gan_decoder_tpu.apps.gen_videos_proj \
    --latents "$OUT/pti/projected_w.npz" "${FT_FLAG[@]}" "${PKL_FLAG[@]}" \
    --outdir "$OUT/video" "${CPU_FLAG[@]}"

echo "PTI pipeline done: $OUT/pti (latents) + $OUT/video (frames)"
