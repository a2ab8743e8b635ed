from .ctc import (
    ctc_metrics_sequence,
    ctc_scores,
    det_errors,
    det_score,
    seg_score,
)
from .f1 import (
    label_overlap,
    intersection_over_union,
    true_positive,
    eval_tp_fp_fn,
    binary_dice,
    remove_boundary_cells,
    relabel_sequential,
    score_pair,
    score_pair_tiled,
)

__all__ = [
    "label_overlap",
    "intersection_over_union",
    "true_positive",
    "eval_tp_fp_fn",
    "binary_dice",
    "remove_boundary_cells",
    "relabel_sequential",
    "score_pair",
    "score_pair_tiled",
    "ctc_scores",
    "ctc_metrics_sequence",
    "seg_score",
    "det_score",
    "det_errors",
]
