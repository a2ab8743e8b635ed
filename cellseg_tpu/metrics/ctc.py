"""CTC SEG / DET measures (native reimplementation).

The reference shells out to the Cell Tracking Challenge's precompiled
SEGMeasure/DETMeasure binaries (KIT-GE segmentation/utils/metrics.py:41-66).
Those are reimplemented here natively, for single frames (2D images) and
for whole CTC sequence directories (ctc_metrics_sequence — the reference's
directory-level ctc_metrics I/O). Hand-derived goldens for split / merge /
miss / spurious cases pin the AOGM-D weights in tests/test_ctc_metrics.py
(the official binaries cannot run here; the goldens substitute for a
binary cross-check):

  SEG — for every GT object, the predicted object covering > 50% of its
        pixels (the CTC matching rule) contributes its Jaccard index;
        unmatched GT objects contribute 0; SEG = mean over GT objects.
  DET — AOGM-D: weighted error count with the CTC weights (false negative
        10, false positive 1, split 5 when one predicted object covers
        >50% of k>1 GT objects), normalized by the cost of building the
        GT graph from scratch (10 per GT node):
        DET = 1 − min(AOGM_D, AOGM_D0) / AOGM_D0.
  OP_CSB = (SEG + DET) / 2 (reference eval.py:232).
"""

from __future__ import annotations

import numpy as np

from .f1 import label_overlap


def _matches(gt: np.ndarray, pred: np.ndarray):
    """Pixel-overlap histogram for CTC matching: (overlap, gt_sizes) with
    overlap[g, j] = |gt==g ∩ pred==j| and gt_sizes[g] = |gt==g|."""
    overlap = label_overlap(gt, pred)
    gt_sizes = overlap.sum(axis=1)
    return overlap, gt_sizes


def _gt_majority_match(overlap: np.ndarray,
                       gt_sizes: np.ndarray) -> np.ndarray:
    """gt_match[g] = pred id covering the strict majority of GT object g
    (0 if none) — the official DETMeasure's detection-test rule."""
    n_gt = overlap.shape[0] - 1
    gt_match = np.zeros(n_gt + 1, dtype=np.int64)
    for g in range(1, n_gt + 1):
        if gt_sizes[g] == 0:
            continue
        row = overlap[g, 1:]
        if row.size:
            j = int(np.argmax(row)) + 1
            if overlap[g, j] * 2 > gt_sizes[g]:
                gt_match[g] = j
    return gt_match


def _n_pred_present(overlap: np.ndarray) -> int:
    """Number of pred objects actually PRESENT in the frame. Label maps
    are not necessarily dense (foi_correction zeroes ids in place without
    relabeling, decode/distance.py:146-147) — counting up to max-id would
    report phantom false positives for every vacated id."""
    pred_sizes = overlap.sum(axis=0)
    return int(np.sum(pred_sizes[1:] > 0))


def seg_object_scores(gt: np.ndarray, pred: np.ndarray) -> list[float]:
    """Per-GT-object Jaccard under the >50% matching rule (one entry per
    GT object present in the frame; 0.0 for unmatched objects)."""
    overlap, gt_sizes = _matches(gt, pred)
    if overlap.shape[0] - 1 <= 0:
        return []
    pred_sizes = overlap.sum(axis=0)
    gt_match = _gt_majority_match(overlap, gt_sizes)
    scores = []
    for g in range(1, overlap.shape[0]):
        if gt_sizes[g] == 0:
            continue
        j = gt_match[g]
        if j > 0:  # strict majority rule
            inter = overlap[g, j]
            union = gt_sizes[g] + pred_sizes[j] - inter
            scores.append(float(inter / union))
        else:
            scores.append(0.0)
    return scores


def seg_score(gt: np.ndarray, pred: np.ndarray) -> float:
    """SEG: mean Jaccard over GT objects under the >50% matching rule."""
    scores = seg_object_scores(gt, pred)
    return float(np.mean(scores)) if scores else 0.0


def det_frame_costs(gt: np.ndarray, pred: np.ndarray,
                    w_fn: float = 10.0, w_fp: float = 1.0,
                    w_split: float = 5.0) -> tuple[float, float]:
    """AOGM-D cost of this frame and the cost of building its GT graph
    from scratch (AOGM-D0). Sequence DET sums both over frames before
    normalizing — per-frame normalization would weight sparse frames up."""
    overlap, gt_sizes = _matches(gt, pred)
    n_gt = overlap.shape[0] - 1
    n_pred = _n_pred_present(overlap)
    if n_gt <= 0:
        return float(w_fp * n_pred), 0.0

    gt_match = _gt_majority_match(overlap, gt_sizes)
    matched_gt = gt_match > 0
    matched_gt[0] = False
    fn = int(np.sum(~matched_gt[1:] & (gt_sizes[1:] > 0)))
    used_preds, counts = np.unique(gt_match[gt_match > 0],
                                   return_counts=True)
    fp = n_pred - len(used_preds)
    splits = int(np.sum(counts - 1))

    aogm = w_fn * fn + w_fp * fp + w_split * splits
    aogm0 = w_fn * int(np.sum(gt_sizes[1:] > 0))
    return float(aogm), float(aogm0)


def det_score(gt: np.ndarray, pred: np.ndarray,
              w_fn: float = 10.0, w_fp: float = 1.0,
              w_split: float = 5.0) -> float:
    """DET: 1 − AOGM-D / AOGM-D0 for a single frame."""
    aogm, aogm0 = det_frame_costs(gt, pred, w_fn, w_fp, w_split)
    if aogm0 == 0:
        return 0.0
    return float(1.0 - min(aogm, aogm0) / aogm0)


def det_errors(gt: np.ndarray, pred: np.ndarray) -> dict:
    """Error decomposition (the reference parses these from the DET log,
    KIT-GE segmentation/utils/metrics.py:82-123): split ops, FN, FP."""
    overlap, gt_sizes = _matches(gt, pred)
    gt_match = _gt_majority_match(overlap, gt_sizes)
    matched = gt_match > 0
    matched[0] = False
    used, counts = np.unique(gt_match[gt_match > 0], return_counts=True)
    return {
        "splitting_operations": int(np.sum(counts - 1)),
        "false_negatives": int(np.sum(~matched[1:] & (gt_sizes[1:] > 0))),
        "false_positives": int(_n_pred_present(overlap) - len(used)),
    }


def ctc_scores(gt: np.ndarray, pred: np.ndarray) -> dict:
    s = seg_score(gt, pred)
    d = det_score(gt, pred)
    return {"SEG": s, "DET": d, "OP_CSB": (s + d) / 2.0}


def _frame_number(name: str) -> str | None:
    """Trailing digit group of a CTC file stem ('man_seg012' → '012')."""
    import re

    m = re.search(r"(\d+)$", name.split(".")[0])
    return m.group(1) if m else None


def ctc_metrics_sequence(data_root: str, res_dir: str, subset: str = "01",
                         mode: str = "GT") -> dict:
    """Directory-level CTC SEG/DET over a whole sequence.

    Matches the reference bridge's I/O (KIT-GE segmentation/utils/
    metrics.py:11-79): ground truth at <data_root>/<subset>_<mode>/SEG/
    man_seg{t}.tif, results at <res_dir>/mask{t}.tif. SEG averages the
    Jaccard over ALL GT objects across annotated frames. DET follows the
    official DETMeasure's annotation source: when a TRA directory with
    man_track{t}.tif marker frames exists it is used (the official binary
    matches detections against TRA markers, which annotate every frame),
    otherwise DET falls back to the SEG frames and the result carries
    det_source='SEG' to flag the approximation. AOGM-D costs are summed
    over frames before normalizing (official measure semantics).
    DET is NaN for mode='ST' like the reference (:64-75).
    """
    import os

    from ..io import imread

    gt_root = os.path.join(data_root, f"{subset}_{mode}")
    seg_dir = os.path.join(gt_root, "SEG")
    if not os.path.isdir(seg_dir):
        raise FileNotFoundError(f"no GT directory: {seg_dir}")
    res_by_frame = {}
    for f in os.listdir(res_dir):
        if f.startswith("mask") and f.split(".")[-1] in ("tif", "tiff"):
            fr = _frame_number(f)
            if fr is not None:
                res_by_frame[int(fr)] = os.path.join(res_dir, f)

    def _pred_for(fr: int, gt: np.ndarray) -> np.ndarray:
        res_path = res_by_frame.get(fr)
        return (np.asarray(imread(res_path)).astype(np.int64)
                if res_path else np.zeros_like(gt))

    seg_files = [(int(fr), os.path.join(seg_dir, f))
                 for f in sorted(os.listdir(seg_dir))
                 if f.startswith("man_seg")
                 and (fr := _frame_number(f)) is not None]

    all_scores: list[float] = []
    frames = []
    for fr, path in seg_files:
        gt = np.asarray(imread(path)).astype(np.int64)
        scores = seg_object_scores(gt, _pred_for(fr, gt))
        all_scores.extend(scores)
        frames.append({"frame": fr, "n_gt": len(scores),
                       "seg": float(np.mean(scores)) if scores else 0.0})

    # DET annotation source: TRA markers when available (official
    # DETMeasure semantics), else the SEG frames as an approximation.
    tra_dir = os.path.join(gt_root, "TRA")
    det_source = "SEG"
    det_gt_files = seg_files
    if os.path.isdir(tra_dir):
        tra_files = [(int(fr), os.path.join(tra_dir, f))
                     for f in sorted(os.listdir(tra_dir))
                     if f.startswith("man_track")
                     and f.split(".")[-1] in ("tif", "tiff")
                     and (fr := _frame_number(f)) is not None]
        if tra_files:
            det_gt_files, det_source = tra_files, "TRA"

    aogm_total, aogm0_total = 0.0, 0.0
    if mode == "GT":  # DET is NaN for ST — skip the frame reads entirely
        for fr, path in det_gt_files:
            gt = np.asarray(imread(path)).astype(np.int64)
            aogm, aogm0 = det_frame_costs(gt, _pred_for(fr, gt))
            aogm_total += aogm
            aogm0_total += aogm0

    seg = float(np.mean(all_scores)) if all_scores else 0.0
    if mode != "GT":
        det = float("nan")
    elif aogm0_total == 0:
        det = 0.0
    else:
        det = float(1.0 - min(aogm_total, aogm0_total) / aogm0_total)
    op = (seg + det) / 2.0 if det == det else seg  # det==det: not NaN
    return {"SEG": seg, "DET": det, "OP_CSB": op, "det_source": det_source,
            "n_frames": len(frames), "frames": frames}
