#!/usr/bin/env bash
# Per-cell-type threshold sweep + best-model export (TPU-native equivalent
# of the reference's eval_kit-sch-ge.sh; uses the native sequence-level
# CTC SEG/DET metrics instead of the precompiled binaries).
#
# Usage: DATA=/path/to/ctc MODELS=/path/to/models bash scripts/eval_kit-sch-ge.sh
set -euo pipefail
DATA="${DATA:-./data}"
MODELS="${MODELS:-./models}"
OUT="${OUT:-./eval}"

evaluate() { # cell_type extra...
  ct="$1"; shift
  python -m cellseg_tpu.cli.eval_distance \
    --data_path "$DATA/$ct" \
    --model_path "$MODELS/${ct}_GT+ST_kit-sch-ge" \
    --th_cell 0.07 --th_seed 0.35 0.45 \
    -o "$OUT/$ct" --copy_best "$OUT/$ct/best" "$@"
}

evaluate "BF-C2DL-HSC"      --artifact_correction
evaluate "BF-C2DL-MuSC"     --artifact_correction
evaluate "DIC-C2DH-HeLa"
evaluate "Fluo-C2DL-MSC"
evaluate "Fluo-N2DH-GOWT1"
evaluate "Fluo-N2DL-HeLa"
evaluate "PhC-C2DH-U373"
evaluate "PhC-C2DL-PSC"
