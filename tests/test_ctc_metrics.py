import numpy as np

from cellseg_tpu.metrics.ctc import ctc_scores, det_score, seg_score


def _blob(c, r0, c0, r1, c1, v):
    c[r0:r1, c0:c1] = v
    return c


def test_perfect_match():
    gt = np.zeros((40, 40), np.int64)
    _blob(gt, 2, 2, 10, 10, 1)
    _blob(gt, 20, 20, 30, 30, 2)
    s = ctc_scores(gt, gt.copy())
    assert s["SEG"] == 1.0 and s["DET"] == 1.0 and s["OP_CSB"] == 1.0


def test_seg_majority_rule():
    gt = np.zeros((20, 20), np.int64)
    _blob(gt, 0, 0, 10, 10, 1)  # 100 px
    pred = np.zeros_like(gt)
    _blob(pred, 0, 0, 10, 4, 1)  # covers 40 px < 50% -> no match
    assert seg_score(gt, pred) == 0.0
    pred2 = np.zeros_like(gt)
    _blob(pred2, 0, 0, 10, 6, 1)  # covers 60 px > 50% -> jaccard 0.6
    assert abs(seg_score(gt, pred2) - 0.6) < 1e-9


def test_det_fn_fp_split():
    gt = np.zeros((40, 40), np.int64)
    _blob(gt, 0, 0, 10, 10, 1)
    _blob(gt, 0, 20, 10, 30, 2)
    _blob(gt, 20, 0, 30, 10, 3)
    # pred: one blob covering gt1+gt2 (split needed), gt3 missed (FN),
    # plus a spurious blob (FP)
    pred = np.zeros_like(gt)
    _blob(pred, 0, 0, 10, 30, 1)
    _blob(pred, 30, 30, 38, 38, 2)
    # AOGM = 10*1 (FN) + 1*1 (FP) + 5*1 (split) = 16; AOGM0 = 30
    expected = 1 - 16 / 30
    assert abs(det_score(gt, pred) - expected) < 1e-9


def test_det_empty_pred():
    gt = np.zeros((20, 20), np.int64)
    _blob(gt, 0, 0, 5, 5, 1)
    assert det_score(gt, np.zeros_like(gt)) == 0.0


def test_rank_time_rule():
    from cellseg_tpu.cli.time_eval import rank_time

    assert rank_time(8.0, 500_000) == 0.0          # under tolerance
    assert rank_time(15.0, 500_000) == 5.0         # ≤1 MP: −10 s
    assert rank_time(50.0, 4_000_000) == 10.0      # 4 MP: −40 s


def test_time_eval_survives_failing_command(tmp_path):
    """Per-case defensive guard: one crashing case must not kill the run
    (reference cellseg_time_eval.py:96-97)."""
    import os

    import numpy as np

    from cellseg_tpu.cli.time_eval import main as te_main
    from cellseg_tpu.io import imwrite

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    imwrite(str(imgs / "a.png"), np.zeros((16, 16, 3), np.uint8))
    out = str(tmp_path / "te")
    te_main(["-i", str(imgs), "-c", "false # always fails {input} {output}",
             "-o", out, "-n", "rt"])
    # CSV still written (empty rows), no exception propagated
    assert os.path.exists(os.path.join(out, "rt.csv"))


def test_det_errors_decomposition():
    from cellseg_tpu.metrics.ctc import det_errors

    gt = np.zeros((30, 30), np.int64)
    gt[0:10, 0:10] = 1
    gt[0:10, 12:22] = 2
    pred = np.zeros_like(gt)
    pred[0:10, 0:22] = 1  # one blob covering both -> 1 split
    e = det_errors(gt, pred)
    assert e["splitting_operations"] == 1
    assert e["false_negatives"] == 0
    assert e["false_positives"] == 0
