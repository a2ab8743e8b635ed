import numpy as np

from cellseg_tpu.metrics import (
    binary_dice,
    eval_tp_fp_fn,
    intersection_over_union,
    label_overlap,
    relabel_sequential,
    remove_boundary_cells,
    score_pair,
    score_pair_tiled,
    true_positive,
)


def _blob(canvas, r0, c0, r1, c1, lab):
    canvas[r0:r1, c0:c1] = lab
    return canvas


def test_label_overlap_basic():
    x = np.array([[0, 1], [2, 2]])
    y = np.array([[0, 1], [1, 2]])
    ov = label_overlap(x, y)
    assert ov.shape == (3, 3)
    assert ov[0, 0] == 1 and ov[1, 1] == 1 and ov[2, 1] == 1 and ov[2, 2] == 1


def test_iou_perfect():
    x = np.zeros((20, 20), dtype=int)
    _blob(x, 2, 2, 8, 8, 1)
    _blob(x, 12, 12, 18, 18, 2)
    iou = intersection_over_union(x, x)
    assert np.allclose(np.diag(iou)[1:], 1.0)


def test_true_positive_threshold():
    iou = np.array([[0.6, 0.0], [0.0, 0.4]])
    assert true_positive(iou, 0.5) == 1
    assert true_positive(iou, 0.3) == 2


def test_eval_tp_fp_fn_empty_pred():
    gt = np.zeros((10, 10), dtype=int)
    gt[2:5, 2:5] = 1
    assert eval_tp_fp_fn(gt, np.zeros_like(gt)) == (0, 0, 0)


def test_eval_counts():
    gt = np.zeros((32, 32), dtype=int)
    _blob(gt, 4, 4, 12, 12, 1)
    _blob(gt, 20, 20, 28, 28, 2)
    pred = np.zeros_like(gt)
    _blob(pred, 4, 4, 12, 12, 1)  # perfect match for cell 1
    _blob(pred, 16, 2, 20, 6, 2)  # spurious
    tp, fp, fn = eval_tp_fp_fn(gt, pred, 0.5)
    assert (tp, fp, fn) == (1, 1, 1)


def test_binary_dice_conventions():
    assert binary_dice(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0
    assert binary_dice(np.zeros((4, 4)), np.ones((4, 4))) == 0.0
    a = np.zeros((4, 4)); a[:2] = 1
    assert binary_dice(a, a) == 1.0


def test_relabel_sequential_order():
    m = np.array([[0, 5], [3, 5]])
    r = relabel_sequential(m)
    assert r.tolist() == [[0, 2], [1, 2]]


def test_remove_boundary_cells():
    m = np.zeros((20, 20), dtype=np.int32)
    _blob(m, 0, 0, 5, 5, 1)      # touches frame -> removed
    _blob(m, 8, 8, 14, 14, 2)    # interior -> kept, relabelled to 1
    out = remove_boundary_cells(m)
    assert out.max() == 1
    assert (out[8:14, 8:14] == 1).all()
    assert (out[0:5, 0:5] == 0).all()


def test_score_pair_perfect():
    gt = np.zeros((64, 64), dtype=np.int32)
    _blob(gt, 10, 10, 20, 20, 1)
    _blob(gt, 40, 40, 52, 52, 2)
    s = score_pair(gt, gt.copy())
    assert s["f1"] == 1.0 and s["tp"] == 2 and s["dice"] == 1.0


def test_score_pair_tiled_matches_untiled():
    rs = np.random.RandomState(0)
    gt = np.zeros((300, 300), dtype=np.int32)
    pred = np.zeros_like(gt)
    lab = 1
    for _ in range(25):
        r, c = rs.randint(10, 280, 2)
        size = rs.randint(5, 12)
        # keep blobs away from the 100-px tile borders so per-tile
        # boundary-cell removal doesn't differ from the global path
        if any(abs((v + d) % 100) < 4 or abs((v + d) % 100) > 96
               for v in (r, c) for d in (0, size)):
            continue
        gt[r:r + size, c:c + size] = lab
        jitter = rs.randint(-1, 2)
        pred[r + jitter:r + size + jitter, c + jitter:c + size + jitter] = lab
        lab += 1
    full = score_pair(gt, pred, threshold=0.5)
    tiled = score_pair_tiled(gt, pred, threshold=0.5, roi_size=100)
    assert tiled["tp"] + tiled["fp"] == tiled["pred_num"]
    # tiled path must agree on totals when no blob crosses a tile border
    assert tiled["true_num"] == full["true_num"]
    assert tiled["tp"] == full["tp"]


def test_score_on_bundled_identity(bundled_samples):
    for name, img, lbl in bundled_samples:
        s = score_pair(lbl.astype(np.int32), lbl.astype(np.int32))
        assert s["f1"] == 1.0, name
