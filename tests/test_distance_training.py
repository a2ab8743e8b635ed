"""Distance trainset builder + dual-head trainer end-to-end (tiny)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trainset(tmp_path_factory):
    from cellseg_tpu.train.distance_data import create_distance_training_set

    raw = tmp_path_factory.mktemp("raw")
    (raw / "images").mkdir()
    (raw / "labels").mkdir()
    from cellseg_tpu.io import imwrite, imwrite_instance_tiff

    rng = np.random.RandomState(0)
    for i in range(3):
        lbl = np.zeros((96, 96), np.int32)
        lbl[10:40, 10:40] = 1
        lbl[50:90, 50:90] = 2
        img = (lbl > 0) * 180 + rng.randint(0, 40, (96, 96))
        imwrite(str(raw / "images" / f"cell_{i:05d}.png"),
                img.astype(np.uint8))
        imwrite_instance_tiff(
            str(raw / "labels" / f"cell_{i:05d}_label.tiff"), lbl)

    out = str(tmp_path_factory.mktemp("trainset"))
    info = create_distance_training_set(str(raw), out, crop_size=96,
                                        val_frac=0.34)
    assert info["counts"]["train"] >= 1 and info["counts"]["val"] >= 1
    return out


def test_dataset_batches(trainset):
    from cellseg_tpu.train.distance_data import DistanceCropDataset

    ds = DistanceCropDataset(trainset, "train")
    imgs, neigh, cell = next(iter(ds.batches(1)))
    assert imgs.shape == (1, 96, 96, 1)
    assert -1.0 <= imgs.min() and imgs.max() <= 1.0
    assert 0 <= cell.min() and cell.max() <= 1.001


@pytest.mark.parametrize("optimizer", ["adam", "ranger"])
def test_train_distance_loss_drops(trainset, tmp_path, optimizer):
    from cellseg_tpu.train.distance_loop import (
        DistanceTrainConfig,
        train_distance,
    )

    cfg = DistanceTrainConfig(
        data_path=trainset,
        work_dir=str(tmp_path / optimizer),
        channels=(8, 16, 32),
        optimizer=optimizer,
        batch_size=2,
        max_epochs=6,
        dtype="float32",
    )
    res = train_distance(cfg)
    assert res["best_val_loss"] < float("inf")
    assert os.path.exists(os.path.join(res["model_path"], "best_model.ckpt"))
    assert os.path.exists(os.path.join(res["model_path"], "config.json"))


def test_distance_predictor_roundtrip(trainset, tmp_path):
    """Train briefly, then run the DistancePredictor end to end."""
    import jax.numpy as jnp

    from cellseg_tpu.infer.distance_infer import DistancePredictor
    from cellseg_tpu.models import build_model
    from cellseg_tpu.train.checkpoint import load_model_for_inference
    from cellseg_tpu.train.distance_loop import (
        DistanceTrainConfig,
        train_distance,
    )

    cfg = DistanceTrainConfig(
        data_path=trainset, work_dir=str(tmp_path / "w"),
        channels=(8, 16, 32), batch_size=2, max_epochs=3,
    )
    res = train_distance(cfg)
    model, params, _ = load_model_for_inference(res["model_path"])
    pred = DistancePredictor(lambda p, x: model.apply(p, x), params)
    img = np.zeros((96, 96), np.uint8)
    img[10:40, 10:40] = 200
    labels = pred.predict(img)
    assert labels.shape == (96, 96)
    assert labels.dtype == np.int32


def test_infer_distance_cli_save_raw_pred(trainset, tmp_path):
    """--save_raw_pred writes cell/raw_border/border float maps next to
    the instance tiff (reference inference.py:118-121)."""
    from cellseg_tpu.cli.infer_distance import main as infer_main
    from cellseg_tpu.io.images import imread, imwrite
    from cellseg_tpu.train.distance_loop import (
        DistanceTrainConfig,
        train_distance,
    )

    cfg = DistanceTrainConfig(
        data_path=trainset, work_dir=str(tmp_path / "w"),
        channels=(8, 16, 32), batch_size=2, max_epochs=2,
    )
    res = train_distance(cfg)

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    img = np.zeros((96, 96), np.uint8)
    img[10:40, 10:40] = 200
    imwrite(str(in_dir / "case0.png"), img)

    infer_main(["-i", str(in_dir), "-o", str(out_dir),
                "--model_path", res["model_path"], "--save_raw_pred"])
    assert (out_dir / "case0_label.tiff").exists()
    for prefix in ("cell", "raw_border", "border"):
        p = out_dir / f"{prefix}case0_label.tiff"
        assert p.exists(), p
        arr = np.asarray(imread(str(p)))
        assert arr.shape == (96, 96) and arr.dtype == np.float32
