"""CLI-level smoke tests for the reference-ABI entry points."""

import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    """A small UNet checkpoint dir with sidecar, ready for the predict CLI."""
    from cellseg_tpu.models import build_model
    from cellseg_tpu.train.checkpoint import save_checkpoint, save_sidecar

    d = str(tmp_path_factory.mktemp("model"))
    model = build_model("unet", channels=(4, 8, 16), strides=(2, 2))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    save_checkpoint(os.path.join(d, "best_model.ckpt"), params)
    save_sidecar(d, {
        "model_name": "unet",
        "architecture": {"channels": [4, 8, 16], "strides": [2, 2]},
        "num_class": 3, "input_size": 64, "in_channels": 3,
        "dtype": "float32", "framework": "cellseg_tpu",
    })
    return d


def test_predict_cli_end_to_end(tiny_model_dir, tmp_path):
    from cellseg_tpu.cli.predict import main as predict_main

    inputs = tmp_path / "inputs"
    inputs.mkdir()
    shutil.copy("/root/reference/data/Train_Labeled/images/cell_00528.tif",
                str(inputs / "cell_00528.tif"))
    outputs = str(tmp_path / "outputs")
    predict_main(["-i", str(inputs), "-o", outputs,
                  "--model_path", tiny_model_dir,
                  "--input_size", "64", "--bucket", "64"])
    out_file = os.path.join(outputs, "cell_00528_label.tiff")
    assert os.path.exists(out_file)
    from cellseg_tpu.io import imread

    labels = np.asarray(imread(out_file))
    assert labels.shape == (200, 200)


def test_compute_metric_cli(tmp_path):
    from cellseg_tpu.cli.compute_metric import main as metric_main
    from cellseg_tpu.io import imwrite_instance_tiff

    gt_dir = tmp_path / "gt"
    seg_dir = tmp_path / "seg"
    gt_dir.mkdir()
    seg_dir.mkdir()
    lbl = np.zeros((64, 64), np.int32)
    lbl[10:25, 10:25] = 1
    lbl[35:55, 35:55] = 2
    imwrite_instance_tiff(str(gt_dir / "img1.tif"), lbl)
    imwrite_instance_tiff(str(seg_dir / "img1_label.tiff"), lbl)
    out = str(tmp_path)
    metric_main(["-g", str(gt_dir), "-s", str(seg_dir),
                 "--gt_suffix", ".tif", "-o", out, "-n", "smoke"])
    csv_path = os.path.join(out, "smoke-0.5.csv")
    assert os.path.exists(csv_path)
    import pandas as pd

    df = pd.read_csv(csv_path)
    assert df["F1"].iloc[0] == 1.0


def test_time_eval_cli(tmp_path):
    from cellseg_tpu.cli.time_eval import main as te_main
    from cellseg_tpu.io import imwrite

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    imwrite(str(imgs / "a.png"),
            np.zeros((32, 32, 3), np.uint8))
    # fake predictor: copy input to expected output name
    cmd = ("python -c \"import sys,shutil,os; "
           "i,o=sys.argv[1],sys.argv[2]; "
           "[shutil.copy(os.path.join(i,f), os.path.join(o, f.split('.')[0]+'_label.tiff')) "
           "for f in os.listdir(i)]\" {input} {output}")
    out = str(tmp_path / "te")
    te_main(["-i", str(imgs), "-c", cmd, "-o", out, "-n", "rt"])
    import pandas as pd

    df = pd.read_csv(os.path.join(out, "rt.csv"))
    assert len(df) == 1 and bool(df["ok"].iloc[0])


@pytest.mark.slow
def test_resume_training(tmp_path, bundled_samples):
    """Resume restores epoch counter and parameters."""
    from cellseg_tpu.cli.pre_process_3class import main as pre_main
    from cellseg_tpu.train.loop import TrainConfig, train_3class

    pre = str(tmp_path / "pre")
    pre_main(["-i", "/root/reference/data/Train_Labeled", "-o", pre])
    base = dict(
        data_path=pre, work_dir=str(tmp_path / "w"), model_name="unet",
        input_size=64, batch_size=2, val_interval=100, min_val_epoch=1000,
        epoch_tolerance=1000, val_frac=0.0, augment=False,
    )
    res1 = train_3class(TrainConfig(**base, max_epochs=3))
    ckpt = os.path.join(res1["model_path"], "final_model.ckpt")
    res2 = train_3class(TrainConfig(**base, max_epochs=5, resume=ckpt))
    # resumed run continues from epoch 3 → runs epochs 3..4 (2 epochs)
    assert len(res2["epoch_loss"]) == 2
