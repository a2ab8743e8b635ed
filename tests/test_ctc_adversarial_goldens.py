"""Adversarial CTC DET/SEG goldens (VERDICT r4 item 8).

The native SEG/DET reimplementation (metrics/ctc.py) substitutes for the
official precompiled binaries the reference shells out to
(KIT-GE segmentation/utils/metrics.py:41-66), which cannot run here. The
basic goldens in test_ctc_metrics.py pin each AOGM-D weight in isolation;
these tests pin COMPOSITE frames derived step-by-step from the published
definitions, so a silent mis-weighting that happens to cancel in the
simple cases cannot survive:

  AOGM-D node weights (Matula et al., PLOS ONE 10(12):e0144959, 2015,
  Table 1 / CTC evaluation methodology): NS (node split) = 5,
  FN (false negative) = 10, FP (false positive) = 1.
  DET = 1 - min(AOGM-D, AOGM-D0)/AOGM-D0 with AOGM-D0 = 10 x #GT nodes.
  Detection test: pred P matches GT G iff |P ∩ G| > 0.5 |G| (strict).
  SEG (Ulman et al., Nature Methods 14:1141, 2017): mean over GT objects
  of Jaccard(G, majority match), 0 for unmatched GT.

Every expected value below is hand-derived in the docstring from those
definitions — the arithmetic is the cross-check.
"""

from __future__ import annotations

import numpy as np

from cellseg_tpu.metrics.ctc import (
    ctc_metrics_sequence,
    det_errors,
    det_frame_costs,
    det_score,
    seg_score,
)


def _frame_combined():
    """5 GT objects of 10 px each (rows 0..4, cols 0..9).

    Pred:
      P1 = all of G1 (10 px) + 6 px of G2      → majority of BOTH → NS=1
      P2 = exactly 5 px of G3 + 3 px backgrnd  → 5/10 is NOT >50% → G3 FN,
                                                 P2 matches nothing → FP
      P3 = all of G4                            → clean match
      (G5 untouched → FN;  P4 = 4 px background → FP)
    """
    gt = np.zeros((8, 16), np.int64)
    for g in range(5):
        gt[g, 0:10] = g + 1
    pred = np.zeros((8, 16), np.int64)
    pred[0, 0:10] = 1          # P1 over G1
    pred[1, 0:6] = 1           # P1 over 6 px of G2
    pred[2, 0:5] = 2           # P2 over 5 px of G3 (exactly half)
    pred[6, 0:3] = 2           # P2 background tail
    pred[3, 0:10] = 3          # P3 = G4
    pred[7, 0:4] = 4           # P4 pure background
    return gt, pred


def test_combined_frame_det():
    """FN=2 (G3, G5), FP=2 (P2, P4), NS=1 (P1 splits across G1,G2):
    AOGM-D = 10*2 + 1*2 + 5*1 = 27; AOGM-D0 = 10*5 = 50;
    DET = 1 - 27/50 = 0.46."""
    gt, pred = _frame_combined()
    aogm, aogm0 = det_frame_costs(gt, pred)
    assert aogm == 27.0 and aogm0 == 50.0
    assert abs(det_score(gt, pred) - 0.46) < 1e-12
    errs = det_errors(gt, pred)
    assert errs == {"splitting_operations": 1, "false_negatives": 2,
                    "false_positives": 2}


def test_combined_frame_seg():
    """|P1| = 16. J(G1,P1) = 10/(10+16-10) = 0.625;
    J(G2,P1) = 6/(10+16-6) = 0.3; G3 unmatched (exactly half) → 0;
    J(G4,P3) = 1; G5 → 0. SEG = (0.625+0.3+0+1+0)/5 = 0.385."""
    gt, pred = _frame_combined()
    assert abs(seg_score(gt, pred) - 0.385) < 1e-12


def test_merge_is_fp_not_split():
    """Two preds on ONE GT object (over-segmentation of a single cell):
    the majority pred matches, the minority pred is a plain FP — the
    NS weight must NOT fire (NS is one pred over many GT, not the
    reverse). G1 = 20 px; P1 covers 11 (majority), P2 covers 9.
    AOGM-D = 1 (FP); AOGM-D0 = 10; DET = 0.9."""
    gt = np.zeros((4, 20), np.int64)
    gt[0:2, 0:10] = 1
    pred = np.zeros((4, 20), np.int64)
    pred[0, 0:10] = 1
    pred[1, 0] = 1             # P1: 11 px of G1
    pred[1, 1:10] = 2          # P2: 9 px of G1
    aogm, aogm0 = det_frame_costs(gt, pred)
    assert aogm == 1.0 and aogm0 == 10.0
    errs = det_errors(gt, pred)
    assert errs == {"splitting_operations": 0, "false_negatives": 0,
                    "false_positives": 1}


def test_three_way_split_counts_k_minus_1():
    """One pred covering the strict majority of THREE GT objects:
    NS = k-1 = 2. AOGM-D = 10; AOGM-D0 = 30; DET = 1 - 10/30 = 2/3."""
    gt = np.zeros((3, 10), np.int64)
    for g in range(3):
        gt[g, 0:10] = g + 1
    pred = np.zeros((3, 10), np.int64)
    pred[:, 0:6] = 1           # 6/10 of each GT row
    aogm, aogm0 = det_frame_costs(gt, pred)
    assert aogm == 10.0 and aogm0 == 30.0
    assert abs(det_score(gt, pred) - (1 - 10.0 / 30.0)) < 1e-12


def test_sequence_pooling_is_cost_pooled_not_score_averaged(tmp_path):
    """AOGM costs pool over frames BEFORE normalizing. Frame 0: 1 GT,
    perfect (AOGM 0 / AOGM0 10). Frame 1: 4 GT, all missed (AOGM 40 /
    AOGM0 40). Pooled DET = 1 - 40/50 = 0.2; a per-frame score average
    would report (1.0 + 0.0)/2 = 0.5 — the adversarial distinction."""
    from cellseg_tpu.io import imwrite

    seg = tmp_path / "data" / "01_GT" / "SEG"
    seg.mkdir(parents=True)
    res = tmp_path / "res"
    res.mkdir()

    f0 = np.zeros((8, 8), np.uint16)
    f0[2:4, 2:4] = 1
    imwrite(str(seg / "man_seg000.tif"), f0)
    imwrite(str(res / "mask000.tif"), f0)

    f1 = np.zeros((8, 8), np.uint16)
    f1[0, 0:2] = 1
    f1[2, 0:2] = 2
    f1[4, 0:2] = 3
    f1[6, 0:2] = 4
    imwrite(str(seg / "man_seg001.tif"), f1)
    imwrite(str(res / "mask001.tif"), np.zeros((8, 8), np.uint16))

    out = ctc_metrics_sequence(str(tmp_path / "data"), str(res))
    assert abs(out["DET"] - 0.2) < 1e-12
    # SEG is object-pooled the same way: (1.0 + 0+0+0+0)/5 = 0.2
    assert abs(out["SEG"] - 0.2) < 1e-12
