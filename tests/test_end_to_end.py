"""End-to-end slice: preprocess → train → predict → score on bundled data."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def preprocessed(tmp_path_factory):
    from cellseg_tpu.cli.pre_process_3class import main as pre_main

    out = str(tmp_path_factory.mktemp("pre3c"))
    pre_main(["-i", "/root/reference/data/Train_Labeled", "-o", out])
    imgs = sorted(os.listdir(os.path.join(out, "images")))
    lbls = sorted(os.listdir(os.path.join(out, "labels")))
    assert len(imgs) == 3 and len(lbls) == 3
    return out


def test_preprocess_outputs(preprocessed):
    from cellseg_tpu.io import imread

    img = imread(os.path.join(preprocessed, "images", "cell_00225.png"))
    lbl = imread(os.path.join(preprocessed, "labels", "cell_00225_label.png"))
    assert img.dtype == np.uint8 and img.shape[-1] == 3
    assert set(np.unique(lbl)) <= {0, 1, 2}
    assert (lbl == 1).sum() > 0 and (lbl == 2).sum() > 0


def test_train_overfit_and_predict(preprocessed, tmp_path):
    """Tiny model, small crops: loss must drop and prediction must produce
    instances on the training image."""
    import jax

    from cellseg_tpu.train.loop import TrainConfig, train_3class

    cfg = TrainConfig(
        data_path=preprocessed,
        work_dir=str(tmp_path / "work"),
        model_name="unet",
        input_size=64,
        batch_size=4,
        max_epochs=16,
        val_interval=4,
        min_val_epoch=0,
        epoch_tolerance=1000,
        initial_lr=3e-3,
        val_frac=0.34,  # 1 of 3 images to val
        augment=False,
    )
    res = train_3class(cfg)
    losses = res["epoch_loss"]
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert os.path.exists(os.path.join(res["model_path"], "final_model.ckpt"))
    assert os.path.exists(os.path.join(res["model_path"], "config.json"))
    # per-epoch rolling resumable checkpoint (reference cadence,
    # model_training_3class.py:269-274)
    assert os.path.exists(os.path.join(res["model_path"], "last_model.ckpt"))

    # predict on a bundled raw image through the full device pipeline
    from cellseg_tpu.infer.predictor import Predictor
    from cellseg_tpu.io import imread
    from cellseg_tpu.train.checkpoint import load_model_for_inference

    ckpt = "best_model.ckpt"
    if not os.path.exists(os.path.join(res["model_path"], ckpt)):
        ckpt = "final_model.ckpt"
    model, params, _ = load_model_for_inference(res["model_path"], ckpt)
    pred = Predictor(lambda p, t: model.apply(p, t), params,
                     roi=64, sw_batch=4, bucket=64)
    img = imread("/root/reference/data/Train_Labeled/images/cell_00528.tif")
    labels = pred.predict(np.asarray(img))
    assert labels.shape == np.asarray(img).shape[:2]
    assert labels.dtype == np.int32
    # 16 epochs on 2 images won't segment well; just require the machinery
    # to produce a well-formed (possibly empty) label map
    assert labels.min() >= 0
