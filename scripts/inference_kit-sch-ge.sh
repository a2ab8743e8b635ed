#!/usr/bin/env bash
# Per-cell-type tuned inference over the CTC challenge datasets
# (TPU-native equivalent of the reference's inference_kit-sch-ge.sh:
# same per-cell-type th_cell/th_seed/artifact-correction settings; the
# 2D-annotation cell types run through cellseg_infer_distance).
#
# Usage: DATA=/path/to/ctc MODELS=/path/to/models bash scripts/inference_kit-sch-ge.sh
set -euo pipefail
DATA="${DATA:-./data}"
MODELS="${MODELS:-./models/kit-sch-ge}"
OUT="${OUT:-./results}"

infer() { # cell_type th_seed extra...
  ct="$1"; th_seed="$2"; shift 2
  for subset in 01 02; do
    [ -d "$DATA/$ct/$subset" ] || continue
    python -m cellseg_tpu.cli.infer_distance \
      -i "$DATA/$ct/$subset" -o "$OUT/$ct/${subset}_RES" \
      --model_path "$MODELS/${ct}_GT+ST_model" \
      --th_cell 0.07 --th_seed "$th_seed" --cell_type "$ct" "$@"
  done
}

# settings mirror the reference script line-for-line (batch size is a GPU
# VRAM knob there; the TPU predictor batches tiles internally)
infer "BF-C2DL-HSC"      0.35 --artifact_correction
infer "BF-C2DL-MuSC"     0.35 --artifact_correction
infer "DIC-C2DH-HeLa"    0.35
infer "Fluo-C2DL-MSC"    0.35
infer "Fluo-N2DH-GOWT1"  0.45
infer "Fluo-N2DL-HeLa"   0.35
infer "PhC-C2DH-U373"    0.35
infer "PhC-C2DL-PSC"     0.45
# 3D cell types (Fluo-C3DH-A549, Fluo-C3DH-H157, Fluo-C3DL-MDA231,
# Fluo-N3DH-CE, Fluo-N3DH-CHO) need the 3D path; the reference's own
# vendored 3D entry is ImportError-broken (SURVEY.md §4) and is not
# reproduced here.
