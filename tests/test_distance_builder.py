"""Training-set builder parity: stats settings, A/B gate, downscale,
GT+ST quotas (reference create_training_sets.py:197-302,458-513,684-733)."""

import json
import os

import numpy as np
import pytest


def _disk_label(size, centers_radii):
    lbl = np.zeros((size, size), np.int32)
    yy, xx = np.mgrid[0:size, 0:size]
    for i, (cy, cx, r) in enumerate(centers_radii, start=1):
        lbl[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = i
    return lbl


def test_td_settings_small_cells_scale1():
    from cellseg_tpu.train.distance_data import compute_td_settings

    masks = [_disk_label(256, [(60, 60, 10), (150, 150, 14)])]
    s = compute_td_settings(masks, crop_size=128)
    assert s["scale"] == 1.0
    assert s["crop_size"] == 128
    # search radius = mean + std of equivalent diameters (~20-28 px)
    assert 15 <= s["search_radius"] <= 40
    # min area = 0.95 * smallest cell area (~314)
    assert 250 <= s["min_area"] <= 310
    # max_mal ≈ largest diameter (28)
    assert 24 <= s["max_mal"] <= 34


def test_td_settings_large_cells_downscale():
    """max diameter > 200 and min diameter > 35 engages the downscale
    ladder (reference :492-505)."""
    from cellseg_tpu.train.distance_data import compute_td_settings

    big = _disk_label(700, [(300, 300, 160)])   # diameter ~320
    small = _disk_label(700, [(100, 100, 35)])  # diameter ~70
    s = compute_td_settings([big, small], crop_size=320)
    assert s["scale"] == 0.5  # max_diameter > 300, min_diameter > 60
    # min_area scaled by scale^2
    area_small = np.pi * 35 * 35
    assert s["min_area"] == pytest.approx(0.25 * 0.95 * int(area_small),
                                          rel=0.05)


def test_crop_quality_gates():
    from cellseg_tpu.train.distance_data import crop_quality

    settings = {"min_area": 100.0, "scale": 1}
    size = 96
    lbl = _disk_label(size, [(48, 48, 20)])
    img = (lbl > 0).astype(np.uint16) * 30000 + 1000
    cell_d = np.where(lbl > 0, 1.0, 0.0).astype(np.float32)

    # healthy single-cell crop: quality A, neighbor map zeroed
    q, zero_n = crop_quality(img, lbl, cell_d, settings)
    assert q == "A" and zero_n

    # no cells in the center margin → rejected
    empty = np.zeros_like(lbl)
    q, _ = crop_quality(img, empty, np.zeros_like(cell_d), settings)
    assert q is None

    # weak cell distance (< 0.8 peak) → rejected
    q, _ = crop_quality(img, lbl, cell_d * 0.5, settings)
    assert q is None

    # almost-background image (mostly exact zeros) → rejected; the
    # GOWT1 carve-out needs a zero in the top-left AND blur-nonzero
    img_bg = np.zeros_like(img)
    img_bg[40:56, 40:56] = 30000
    big_settings = {"min_area": 10.0, "scale": 1}
    q, _ = crop_quality(img_bg, lbl, cell_d, big_settings)
    # top-left min is 0 → carve-out applies; blurred still mostly 0 → reject
    assert q is None

    # partial cells drop quality to B: 1 full cell + 1 tiny fragment
    lbl2 = lbl.copy()
    lbl2[0, 0:3] = 2  # 3-px fragment (area <= 0.1 * min_area)
    # 2 ids, 1 partial → (2-1)=1 >= 0.8*2? no → reject; use 5 cells
    lbl5 = _disk_label(size, [(20, 20, 9), (20, 70, 9), (70, 20, 9),
                              (70, 70, 9), (48, 48, 9)])
    lbl5[0, 0:3] = 6  # fragment → 6 ids, 1 partial → 5 >= 0.8*6 → B
    q, zero_n = crop_quality(img, lbl5, cell_d, settings)
    assert q == "B" and not zero_n


def _write_ctc_tree(root, n_frames=6, size=96, with_st=True,
                    gt_frames=(0, 1)):
    """Synthetic CTC tree: 01/t00k.tif + 01_GT/SEG + (optionally) 01_ST/SEG
    for every frame."""
    from cellseg_tpu.io import imwrite, imwrite_instance_tiff

    os.makedirs(os.path.join(root, "01"), exist_ok=True)
    os.makedirs(os.path.join(root, "01_GT", "SEG"), exist_ok=True)
    if with_st:
        os.makedirs(os.path.join(root, "01_ST", "SEG"), exist_ok=True)
    rng = np.random.RandomState(0)
    for t in range(n_frames):
        lbl = _disk_label(size, [(30, 30, 12), (70, 70, 12)])
        img = ((lbl > 0) * 180 + rng.randint(0, 40, (size, size))
               ).astype(np.uint8)
        imwrite(os.path.join(root, "01", f"t{t:03d}.tif"), img)
        if t in gt_frames:
            imwrite_instance_tiff(
                os.path.join(root, "01_GT", "SEG", f"man_seg{t:03d}.tif"),
                lbl)
        if with_st:
            imwrite_instance_tiff(
                os.path.join(root, "01_ST", "SEG", f"man_seg{t:03d}.tif"),
                lbl)


def test_gt_st_mixing_drops_st_on_gt_frames(tmp_path):
    """GT+ST: ST crops whose frame carries a GT annotation are removed
    (reference remove_st_with_gt_annotation, :700-704)."""
    from cellseg_tpu.train.distance_data import create_distance_training_set

    root = str(tmp_path / "ctc")
    _write_ctc_tree(root, n_frames=6, gt_frames=(0, 1))
    out = str(tmp_path / "ts")
    info = create_distance_training_set(root, out, crop_size=96,
                                        val_frac=0.34, ctc_mode="GT+ST")
    ids = json.load(open(os.path.join(out, "split.json")))
    all_ids = ids["train"] + ids["val"]
    # GT frames 0,1 appear as GT crops; their ST twins must be absent
    st_ids = [i for i in all_ids if "_ST_" in i]
    gt_ids = [i for i in all_ids if "_GT_" in i]
    assert len(gt_ids) == 2
    st_frames = {i.split("_")[1] for i in st_ids}  # stem part: t00k
    assert "t000" not in st_frames and "t001" not in st_frames
    assert info["counts"]["train"] + info["counts"]["val"] == len(all_ids)


def test_gt_st_quota_caps_st_crops(tmp_path):
    """With plentiful GT, added STs are capped at max(0.33·GT, 75−GT)
    per split (reference :694-699)."""
    from cellseg_tpu.train.distance_data import (_create_from_pairs,
                                                 create_distance_training_set)

    root = str(tmp_path / "ctc")
    # 30 GT frames + 90 ST-only frames won't fit in a quick test; instead
    # check the quota arithmetic through a small tree: 3 GT frames,
    # 20 ST frames → quota train = max(0, 75 - n_gt_train) → all STs kept
    _write_ctc_tree(root, n_frames=20, gt_frames=(0, 1, 2))
    out = str(tmp_path / "ts")
    create_distance_training_set(root, out, crop_size=96, val_frac=0.34,
                                 ctc_mode="GT+ST")
    ids = json.load(open(os.path.join(out, "split.json")))
    st_train = [i for i in ids["train"] if "_ST_" in i]
    # 17 ST frames usable (3 have GT) and quota = 75 - n_gt_train ≥ 17 →
    # all usable STs are kept
    assert len(st_train) >= 10


def test_frozen_split_reproduction(tmp_path):
    from cellseg_tpu.train.distance_data import create_distance_training_set

    root = str(tmp_path / "ctc")
    _write_ctc_tree(root, n_frames=4, with_st=False, gt_frames=(0, 1, 2, 3))
    out1 = str(tmp_path / "ts1")
    create_distance_training_set(root, out1, crop_size=96, val_frac=0.5,
                                 ctc_mode="GT")
    # rebuild with the recorded split frozen: identical membership
    out2 = str(tmp_path / "ts2")
    create_distance_training_set(
        root, out2, crop_size=96, val_frac=0.5, ctc_mode="GT",
        frozen_split=os.path.join(out1, "split.json"))
    s1 = json.load(open(os.path.join(out1, "split.json")))
    s2 = json.load(open(os.path.join(out2, "split.json")))
    assert s1 == s2


def test_combine_training_sets_caps_and_subsampling(tmp_path):
    """Multi-cell-type combination: GT+ST per-type caps and GT
    neighbor-aware subsampling (reference :868-975)."""
    from cellseg_tpu.train.distance_data import combine_training_sets

    def mk_set(name, n_train, with_neighbor):
        root = tmp_path / name
        for s, n in (("train", n_train), ("val", 3)):
            (root / s).mkdir(parents=True)
            for i in range(n):
                np.savez(str(root / s / f"c_{i:03d}.npz"),
                         img=np.zeros((8, 8), np.uint16),
                         dist_cell=np.zeros((8, 8), np.float32),
                         dist_neighbor=(np.ones((8, 8), np.float32)
                                        if with_neighbor
                                        else np.zeros((8, 8), np.float32)),
                         mask=np.zeros((8, 8), bool))
        return str(root)

    a = mk_set("typeA", 20, True)
    b = mk_set("typeB", 20, True)
    out = str(tmp_path / "combined")
    info = combine_training_sets({"A": a, "B": b}, out, mode="GT+ST",
                                 n_max_train_gt_st=5, n_max_val_gt_st=2)
    assert info["train"] == {"A": 5, "B": 5}
    assert info["val"] == {"A": 2, "B": 2}
    files = os.listdir(os.path.join(out, "train"))
    assert len(files) == 10 and any(f.startswith("A_") for f in files)

    # GT mode, small sets, all with neighbors → everything kept
    out2 = str(tmp_path / "combined2")
    info2 = combine_training_sets({"A": a, "B": b}, out2, mode="GT")
    assert info2["train"] == {"A": 20, "B": 20}

    # GT mode, big no-neighbor set → p_no_neighbor = 0.5 subsampling
    big = mk_set("typeC", 160, False)
    out3 = str(tmp_path / "combined3")
    info3 = combine_training_sets({"C": big}, out3, mode="GT", seed=1)
    assert 50 <= info3["train"]["C"] <= 110  # ~0.5 * 160


def test_cli_ctc_mode_and_frozen_split(tmp_path, monkeypatch):
    """The train_distance CLI exposes the builder's CTC knobs
    (reference train.py --mode/--split/--cell_type): --mode routes a CTC
    tree through the builder and --split freezes the crop membership."""
    from cellseg_tpu.cli import train_distance as cli

    root = str(tmp_path / "ctc")
    _write_ctc_tree(root, n_frames=4, with_st=False, gt_frames=(0, 1, 2, 3))

    seen = {}

    def fake_train(cfg):
        seen["data_path"] = cfg.data_path
        return {"best_val_loss": 0.0, "epochs_run": 0, "wall_seconds": 0.0}

    monkeypatch.setattr(cli, "train_distance", fake_train)

    wd1 = str(tmp_path / "wd1")
    cli.main(["--data_path", root, "--work_dir", wd1, "--mode", "GT",
              "--crop_size", "96", "--val_frac", "0.5"])
    ts1 = os.path.join(wd1, "distance_trainset")
    assert seen["data_path"] == ts1
    split1 = json.load(open(os.path.join(ts1, "split.json")))
    assert split1["train"] and split1["val"]

    wd2 = str(tmp_path / "wd2")
    cli.main(["--data_path", root, "--work_dir", wd2, "--mode", "GT",
              "--crop_size", "96", "--val_frac", "0.5",
              "--split", os.path.join(ts1, "split.json")])
    split2 = json.load(open(
        os.path.join(wd2, "distance_trainset", "split.json")))
    assert split1 == split2
