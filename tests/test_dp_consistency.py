"""Data-parallel training correctness: N-device loss == 1-device loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from cellseg_tpu.models import build_model
from cellseg_tpu.parallel import make_mesh, replicate, shard_batch
from cellseg_tpu.pipeline.augment import AugmentConfig
from cellseg_tpu.train.steps import TrainState, make_train_step

pytestmark = pytest.mark.slow


def _run(n_devices: int, steps: int = 3):
    model = build_model("unet", channels=(8, 16, 32), strides=(2, 2))
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 64, 64, 3)))
    tx = optax.adamw(1e-3)
    state = TrainState.create(
        lambda p, x, train=False: model.apply(p, x), params, tx)

    mesh = make_mesh(n_devices)
    if n_devices > 1:
        state = state.replace(params=replicate(mesh, state.params),
                              opt_state=replicate(mesh, state.opt_state))
    step_fn = make_train_step(num_classes=3, augment=AugmentConfig(),
                              donate=False)
    data_rng = np.random.RandomState(3)
    losses = []
    key = jax.random.PRNGKey(7)
    for s in range(steps):
        imgs = data_rng.randint(0, 255, (8, 64, 64, 3)).astype(np.uint8)
        lbls = data_rng.randint(0, 3, (8, 64, 64)).astype(np.int32)
        if n_devices > 1:
            imgs, lbls = shard_batch(mesh, (imgs, lbls))
        key, sk = jax.random.split(key)
        state, loss = step_fn(state, jnp.asarray(imgs), jnp.asarray(lbls), sk)
        losses.append(float(loss))
    return losses


def test_loss_curve_matches_across_device_counts():
    l1 = _run(1)
    l4 = _run(4)
    # identical data, seeds, and per-sample augmentation keys; only the
    # reduction order differs across shards
    np.testing.assert_allclose(l1, l4, rtol=2e-5)


def _synth_raw(tmp_path, n=4, size=64):
    import os

    from cellseg_tpu.io import imwrite, imwrite_instance_tiff

    raw = str(tmp_path / "raw")
    os.makedirs(os.path.join(raw, "images"))
    os.makedirs(os.path.join(raw, "labels"))
    rng = np.random.RandomState(0)
    for i in range(n):
        lbl = np.zeros((size, size), np.int32)
        lbl[8:28, 8:28] = 1
        lbl[36:60, 36:60] = 2
        img = (lbl > 0) * 180 + rng.randint(0, 40, (size, size))
        imwrite(os.path.join(raw, "images", f"cell_{i:05d}.png"),
                img.astype(np.uint8))
        imwrite_instance_tiff(
            os.path.join(raw, "labels", f"cell_{i:05d}_label.tiff"), lbl)
    return raw


def test_distance_loop_dp_consistency(tmp_path):
    """train_distance with a 4-device mesh reproduces the 1-device loss
    curve (replicated params + sharded batch; the reference's DataParallel
    analog for the KIT-GE trainer)."""
    from cellseg_tpu.train.distance_data import create_distance_training_set
    from cellseg_tpu.train.distance_loop import (DistanceTrainConfig,
                                                 train_distance)

    raw = _synth_raw(tmp_path)
    ts = str(tmp_path / "trainset")
    create_distance_training_set(raw, ts, crop_size=64, val_frac=0.25)

    histories = []
    for n_dev in (1, 4):
        cfg = DistanceTrainConfig(
            data_path=ts, work_dir=str(tmp_path / f"wd{n_dev}"),
            channels=(8, 16, 32), batch_size=4, max_epochs=2,
            n_devices=n_dev)
        res = train_distance(cfg)
        h = np.load(f"{res['model_path']}/loss_history.npz")
        histories.append(np.concatenate([h["train"], h["val"]]))
    np.testing.assert_allclose(histories[0], histories[1], rtol=2e-4)


def test_flow_loop_dp_consistency(tmp_path):
    from cellseg_tpu.train.flow_loop import FlowTrainConfig, train_flow

    raw = _synth_raw(tmp_path)
    histories = []
    for n_dev in (1, 4):
        cfg = FlowTrainConfig(
            data_path=raw, work_dir=str(tmp_path / f"wd{n_dev}"),
            channels=(8, 16, 32), input_size=64, batch_size=4,
            max_epochs=2, n_devices=n_dev)
        res = train_flow(cfg)
        histories.append(np.asarray(res["history"]))
    np.testing.assert_allclose(histories[0], histories[1], rtol=2e-4)
