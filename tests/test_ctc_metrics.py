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


# ---- hand-derived goldens pinning the AOGM-D weights (FN 10, FP 1,
# split 5) on adversarial cases; the official binaries can't run here,
# these substitute for a binary cross-check -------------------------------

def _two_squares(size=40):
    gt = np.zeros((size, size), np.int64)
    gt[5:15, 5:15] = 1    # 100 px
    gt[25:35, 25:35] = 2  # 100 px
    return gt


def test_golden_merge():
    """Two GT cells merged into one prediction: 1 split op.
    AOGM = 5, AOGM0 = 20 → DET = 1 − 5/20 = 0.75.
    SEG: each GT fully covered by the union blob; Jaccard = 100/200 = 0.5."""
    from cellseg_tpu.metrics.ctc import det_score, seg_score

    gt = _two_squares()
    pred = np.zeros_like(gt)
    pred[(gt == 1) | (gt == 2)] = 1
    assert det_score(gt, pred) == 0.75
    assert abs(seg_score(gt, pred) - 0.5) < 1e-9


def test_golden_split_60_40():
    """One GT cell predicted as a 60/40 split: the 60% piece matches, the
    40% piece is an FP. AOGM = 1, AOGM0 = 10 → DET = 0.9.
    SEG: Jaccard of the matching piece = 60/100 = 0.6."""
    from cellseg_tpu.metrics.ctc import det_score, seg_score

    gt = np.zeros((20, 20), np.int64)
    gt[5:15, 0:10] = 1  # 100 px
    pred = np.zeros_like(gt)
    pred[5:15, 0:6] = 1   # 60 px of the cell
    pred[5:15, 6:10] = 2  # remaining 40 px
    assert det_score(gt, pred) == 0.9
    assert abs(seg_score(gt, pred) - 0.6) < 1e-9


def test_golden_miss():
    """Two GT cells, one detected: FN = 1 → AOGM = 10, AOGM0 = 20 →
    DET = 0.5."""
    from cellseg_tpu.metrics.ctc import det_score

    gt = _two_squares()
    pred = np.zeros_like(gt)
    pred[gt == 1] = 1
    assert det_score(gt, pred) == 0.5


def test_golden_spurious():
    """Both cells detected + one extra prediction: FP = 1 → AOGM = 1,
    AOGM0 = 20 → DET = 0.95."""
    from cellseg_tpu.metrics.ctc import det_score

    gt = _two_squares()
    pred = gt.copy()
    pred[0:3, 20:23] = 3
    assert det_score(gt, pred) == 0.95


def test_golden_exact_half_is_unmatched():
    """The CTC rule is a STRICT majority: covering exactly 50% of a GT
    object does not match → FN, and both pieces are FPs.
    AOGM = 10 + 2 = 12, AOGM0 = 10 → clipped → DET = 0."""
    from cellseg_tpu.metrics.ctc import det_score, seg_score

    gt = np.zeros((20, 20), np.int64)
    gt[5:15, 0:10] = 1
    pred = np.zeros_like(gt)
    pred[5:15, 0:5] = 1
    pred[5:15, 5:10] = 2
    assert det_score(gt, pred) == 0.0
    assert seg_score(gt, pred) == 0.0


# ---- sequence-level directory scoring ------------------------------------

def _write_ctc_eval_tree(root):
    """<root>/data/01_GT/SEG/man_seg00k.tif + <root>/res/mask00k.tif"""
    import os

    from cellseg_tpu.io import imwrite_instance_tiff

    seg = os.path.join(root, "data", "01_GT", "SEG")
    res = os.path.join(root, "res")
    os.makedirs(seg), os.makedirs(res)

    # frame 0: perfect (2 cells); frame 1: merge; frame 2: miss one of two
    gt = _two_squares()
    cases = {
        0: gt.copy(),
        1: np.where(gt > 0, 1, 0).astype(np.int64),
        2: np.where(gt == 1, 1, 0).astype(np.int64),
    }
    for t in range(3):
        imwrite_instance_tiff(os.path.join(seg, f"man_seg{t:03d}.tif"), gt)
        imwrite_instance_tiff(os.path.join(res, f"mask{t:03d}.tif"),
                              cases[t])
    return os.path.join(root, "data"), res


def test_sequence_level_scores(tmp_path):
    """Sequence DET pools AOGM over frames: frame costs 0 + 5 + 10 over
    AOGM0 = 60 → DET = 0.75. Sequence SEG averages over all 6 GT objects:
    (1 + 1 + 0.5 + 0.5 + 1 + 0) / 6 = 2/3."""
    from cellseg_tpu.metrics.ctc import ctc_metrics_sequence

    data_root, res_dir = _write_ctc_eval_tree(str(tmp_path))
    out = ctc_metrics_sequence(data_root, res_dir, subset="01", mode="GT")
    assert out["n_frames"] == 3
    assert abs(out["DET"] - 0.75) < 1e-9
    assert abs(out["SEG"] - 2.0 / 3.0) < 1e-9
    # per-frame rows present and ordered
    assert [f["frame"] for f in out["frames"]] == [0, 1, 2]


def test_sequence_missing_result_frame(tmp_path):
    """A GT frame without a result file counts as all-FN, not a crash."""
    import os

    from cellseg_tpu.metrics.ctc import ctc_metrics_sequence

    data_root, res_dir = _write_ctc_eval_tree(str(tmp_path))
    os.remove(os.path.join(res_dir, "mask002.tif"))
    out = ctc_metrics_sequence(data_root, res_dir)
    # frame 2 now contributes 2 FNs (cost 20) instead of 10:
    # DET = 1 - (0+5+20)/60
    assert abs(out["DET"] - (1 - 25 / 60)) < 1e-9


def test_ctc_measure_cli(tmp_path, capsys):
    """The binary-shaped CLI prints 'SEG measure: x' / 'DET measure: x'."""
    import os

    from cellseg_tpu.cli.ctc_measure import main

    data_root, res_dir = _write_ctc_eval_tree(str(tmp_path))
    # move results into the <root>/01_RES layout the CLI defaults to
    os.rename(res_dir, os.path.join(data_root, "01_RES"))
    main([data_root, "01"])
    out = capsys.readouterr().out
    assert "SEG measure: 0.666667" in out
    assert "DET measure: 0.750000" in out


# --- property-based pins beyond the hand goldens (VERDICT r2 item 7):
# the official binaries can't run here, so invariances of the measures
# are asserted on randomized label worlds instead.

def _random_world(seed, h=96, w=96, n=8):
    rng = np.random.RandomState(seed)
    gt = np.zeros((h, w), np.int64)
    yy, xx = np.mgrid[0:h, 0:w]
    k = 0
    for _ in range(n):
        cy, cx, r = rng.randint(10, h - 10), rng.randint(10, w - 10), rng.randint(4, 9)
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        blob &= gt == 0
        if blob.sum() >= 8:
            k += 1
            gt[blob] = k
    return gt


def test_permutation_invariance():
    """SEG and DET must not depend on the pred label numbering."""
    from cellseg_tpu.metrics.ctc import det_score, seg_score

    gt = _random_world(0)
    pred = _random_world(0)  # identical geometry
    rng = np.random.RandomState(1)
    ids = np.unique(pred[pred > 0])
    perm = rng.permutation(len(ids)) + 1
    remap = np.zeros(int(pred.max()) + 1, np.int64)
    for i, v in zip(ids, perm):
        remap[i] = v
    pred_perm = remap[pred]

    assert seg_score(gt, pred) == seg_score(gt, pred_perm)
    assert det_score(gt, pred) == det_score(gt, pred_perm)


def test_added_false_positives_monotonically_hurt_det():
    from cellseg_tpu.metrics.ctc import det_score

    gt = _random_world(2)
    pred = gt.copy()
    scores = [det_score(gt, pred)]
    nxt = int(pred.max())
    for i in range(3):
        # add a spurious object in free space
        free = np.argwhere(pred == 0)
        y, x = free[len(free) // (2 + i)]
        y0, y1 = max(y - 2, 0), min(y + 3, pred.shape[0])
        x0, x1 = max(x - 2, 0), min(x + 3, pred.shape[1])
        box = pred[y0:y1, x0:x1]
        if (box == 0).all():
            nxt += 1
            pred[y0:y1, x0:x1] = nxt
            scores.append(det_score(gt, pred))
    assert all(a >= b for a, b in zip(scores, scores[1:])), scores
    assert scores[-1] < scores[0]


def test_removed_objects_monotonically_hurt_det_and_seg():
    from cellseg_tpu.metrics.ctc import det_score, seg_score

    gt = _random_world(3)
    pred = gt.copy()
    det_scores = [det_score(gt, pred)]
    seg_scores = [seg_score(gt, pred)]
    for i in np.unique(gt[gt > 0])[:3]:
        pred[pred == i] = 0
        det_scores.append(det_score(gt, pred))
        seg_scores.append(seg_score(gt, pred))
    assert all(a > b for a, b in zip(det_scores, det_scores[1:])), det_scores
    assert all(a > b for a, b in zip(seg_scores, seg_scores[1:])), seg_scores


def test_split_costs_less_than_miss():
    """CTC AOGM-D weights: a split (5) must cost less than a full miss
    (10) — one predicted object covering two GT cells scores better than
    covering neither."""
    from cellseg_tpu.metrics.ctc import det_score

    gt = np.zeros((40, 40), np.int64)
    gt[5:15, 5:35] = 1
    gt[25:35, 5:35] = 2
    merged = np.zeros_like(gt)
    merged[(gt > 0)] = 1  # one pred covering both (split error)
    nothing = np.zeros_like(gt)
    assert det_score(gt, merged) > det_score(gt, nothing)


def test_seg_is_mean_jaccard_of_matches():
    """SEG equals the analytic mean Jaccard on a constructed case."""
    from cellseg_tpu.metrics.ctc import seg_score

    gt = np.zeros((20, 30), np.int64)
    gt[2:10, 2:10] = 1       # 64 px
    gt[2:10, 15:27] = 2      # 96 px
    pred = np.zeros_like(gt)
    pred[2:10, 2:8] = 1      # covers 48/64 of gt1 (>50%), union 64+48-48=64
    pred[4:12, 15:27] = 2    # covers 72/96 of gt2 (>50%), union 96+96-72=120
    expect = np.mean([48 / 64, 72 / 120])
    assert abs(seg_score(gt, pred) - expect) < 1e-12


def test_det_not_penalized_by_non_dense_pred_ids():
    """foi_correction zeroes ids in place without relabeling — DET must
    count PRESENT pred objects, not assume dense ids up to max."""
    from cellseg_tpu.metrics.ctc import det_errors, det_score

    gt = np.zeros((32, 32), np.int64)
    gt[2:10, 2:10] = 1
    gt[20:28, 20:28] = 2
    pred = np.zeros((32, 32), np.int64)
    pred[2:10, 2:10] = 1
    pred[20:28, 20:28] = 5  # non-dense: ids {1, 5}
    assert det_score(gt, pred) == 1.0
    errs = det_errors(gt, pred)
    assert errs["false_positives"] == 0, errs
    # a genuinely extra PRESENT object still counts
    pred2 = pred.copy()
    pred2[14:18, 2:6] = 9
    assert det_errors(gt, pred2)["false_positives"] == 1
