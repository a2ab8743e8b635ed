import os

import numpy as np
import pytest


def test_train_flow_tiny(tmp_path):
    from cellseg_tpu.io import imwrite, imwrite_instance_tiff
    from cellseg_tpu.train.flow_loop import FlowTrainConfig, train_flow

    raw = tmp_path / "raw"
    (raw / "images").mkdir(parents=True)
    (raw / "labels").mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        lbl = np.zeros((80, 80), np.int32)
        lbl[10:35, 10:35] = 1
        lbl[45:75, 45:75] = 2
        img = (lbl > 0) * 150 + rng.randint(0, 40, (80, 80))
        imwrite(str(raw / "images" / f"c_{i:03d}.png"), img.astype(np.uint8))
        imwrite_instance_tiff(str(raw / "labels" / f"c_{i:03d}_label.tiff"),
                              lbl)

    cfg = FlowTrainConfig(
        data_path=str(raw), work_dir=str(tmp_path / "w"),
        channels=(8, 16, 32), input_size=64, batch_size=2, max_epochs=4,
    )
    res = train_flow(cfg)
    assert os.path.exists(os.path.join(res["model_path"], "best_model.ckpt"))
    first, last = res["history"][0][0], res["history"][-1][0]
    assert last < first, (first, last)
