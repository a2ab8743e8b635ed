"""Dual-head distance-regression training loop (KIT-GE capability).

Behavioral parity with the reference trainer
(KIT-GE segmentation/training/training.py:60-273): SmoothL1(border) +
SmoothL1(cell) loss, Adam(amsgrad)+ReduceLROnPlateau or Ranger with a
cosine fine-tune second phase (train.py:179-193), dataset-size-scaled
epoch budget, best-val-loss checkpointing with a JSON sidecar, early break
when the LR floor is reached.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import build_model
from .checkpoint import save_checkpoint, save_sidecar
from .distance_data import DistanceCropDataset, get_max_epochs
from .losses import dual_distance_loss
from .optim import (ReduceLROnPlateau, adam_amsgrad,
                    cosine_finetune_schedule, ranger, set_learning_rate)
from .steps import TrainState

join = os.path.join


@dataclasses.dataclass
class DistanceTrainConfig:
    data_path: str = "./trainset"
    work_dir: str = "./work_dir"
    model_name: str = "dunet"
    channels: tuple = (64, 128, 256, 512, 1024)
    act: str = "relu"     # relu | leakyrelu | elu | gelu | mish | prelu
    norm: str = "group"   # group (gn) | instance (in) | layer | none
    pool: str = "conv"    # conv (strided) | max (reference pool_method)
    loss: str = "smooth_l1"
    optimizer: str = "adam"  # adam | ranger
    batch_size: int = 8
    learning_rate: float = 8e-4  # reference: adam 8e-4, ranger 6e-3
    max_epochs: int | None = None
    seed: int = 2022
    dtype: str = "float32"
    break_condition: int = 2  # consecutive LR-floor epochs before break
    augment: bool = True  # KIT-GE augmentors (on device)
    pretrain: bool = False  # autoencoder-pretrain the encoder first
    pretrain_epochs: int = 60
    # CTC-layout directory (<dir>/01, <dir>/02 frame sequences) to draw the
    # pretraining corpus from with the reference's frame-subsampling +
    # random-z-slice heuristics (autoencoder_dataset.py:8-85); None =
    # pretrain on the training crops
    pretrain_data: str | None = None
    retrain: str | None = None  # warm-start from an old model dir
    n_devices: int | None = None  # data-parallel mesh size (None = all)


def _make_step(apply_fn, tx, loss_kind, augment: bool):
    from ..pipeline.augment_distance import augment_distance_batch

    def step(state: TrainState, imgs, border_gt, cell_gt, rng):
        if augment:
            imgs, border_gt, cell_gt = augment_distance_batch(
                rng, imgs, border_gt, cell_gt)

        def loss_fn(params):
            border, cell = apply_fn(params, imgs)
            return dual_distance_loss(border, cell, border_gt, cell_gt,
                                      kind=loss_kind)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return jax.jit(step, donate_argnums=(0,))


def _eval_loss(apply_fn, loss_kind):
    @jax.jit
    def f(params, imgs, border_gt, cell_gt):
        border, cell = apply_fn(params, imgs)
        return dual_distance_loss(border, cell, border_gt, cell_gt,
                                  kind=loss_kind)

    return f


def train_distance(cfg: DistanceTrainConfig) -> dict:
    model_dir = join(cfg.work_dir, f"{cfg.model_name}_distance")
    os.makedirs(model_dir, exist_ok=True)

    train_ds = DistanceCropDataset(cfg.data_path, "train", seed=cfg.seed)
    val_ds = DistanceCropDataset(cfg.data_path, "val", seed=cfg.seed)
    max_epochs = cfg.max_epochs or get_max_epochs(len(train_ds))
    print(f"distance train: {len(train_ds)} train / {len(val_ds)} val crops, "
          f"max {max_epochs} epochs")

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = build_model(cfg.model_name, dtype=dtype, channels=cfg.channels,
                        act=cfg.act, norm=cfg.norm, pool=cfg.pool)
    # infer crop size from the data
    sample = train_ds.items[0][0]
    crop = sample.shape[0]
    rng = jax.random.PRNGKey(cfg.seed)
    params = model.init(rng, jnp.zeros((1, crop, crop, 1), jnp.float32))

    if cfg.pretrain and cfg.retrain:
        raise ValueError("Use either --pre_train or --retrain, not both "
                         "(reference train.py:111-112)")
    if cfg.retrain:
        # warm-start from an old model with architecture check
        # (reference train.py:114-122)
        import json as _json

        from .checkpoint import restore_params

        with open(join(cfg.retrain, "config.json")) as f:
            old_cfg = _json.load(f)
        old_ch = list(old_cfg.get("architecture", {}).get("channels", []))
        if old_ch and old_ch != list(cfg.channels):
            raise ValueError(
                f"Architecture of model to retrain does not match: "
                f"{old_ch} vs {list(cfg.channels)}")
        params, _ = restore_params(join(cfg.retrain, "best_model.ckpt"),
                                   params)
        print(f"retraining from {cfg.retrain}")

    if cfg.pretrain:
        # KIT-GE --pre_train flow: autoencoder pretraining on the training
        # crops, then encoder transfer (reference train.py:149-158)
        from .pretrain import load_pretrain_corpus, train_auto, transfer_encoder

        if cfg.pretrain_data:
            imgs = load_pretrain_corpus(cfg.pretrain_data, seed=cfg.seed)
        else:
            imgs = [it[0].astype(np.float32) / 65535.0 * 2.0 - 1.0
                    for it in train_ds.items]
        pre_params, _ = train_auto(
            imgs, channels=tuple(cfg.channels), crop=min(crop, 320),
            batch_size=cfg.batch_size, epochs=cfg.pretrain_epochs,
            seed=cfg.seed, dtype=dtype, act=cfg.act, norm=cfg.norm,
            pool=cfg.pool)
        params = transfer_encoder(pre_params, params)
        print("encoder pretrained and transferred")

    lr = cfg.learning_rate if cfg.optimizer == "adam" else 6e-3
    if cfg.optimizer == "ranger":
        tx = ranger(learning_rate=lr)
    else:
        # injected LR so ReduceLROnPlateau shrinks the true step size
        # (reference training.py:111-124)
        tx = adam_amsgrad(lr)
    apply_fn = lambda p, x: model.apply(p, x)
    state = TrainState.create(lambda p, x, train=False: model.apply(p, x),
                              params, tx)

    # data parallelism over the ICI mesh (the reference trains KIT-GE with
    # nn.DataParallel, segmentation/utils/unets.py:50-51): replicated
    # params, sharded batch, XLA inserts the gradient all-reduce
    from ..parallel import make_mesh, replicate, shard_batch

    n_avail = cfg.n_devices or len(jax.devices())
    n_dev = max(d for d in range(1, n_avail + 1) if cfg.batch_size % d == 0)
    mesh = make_mesh(n_dev)
    if n_dev > 1:
        print(f"data-parallel over {n_dev} devices")
        state = state.replace(params=replicate(mesh, state.params),
                              opt_state=replicate(mesh, state.opt_state))

    def place(imgs, neigh, cell):
        if n_dev > 1 and imgs.shape[0] % n_dev == 0:
            return shard_batch(mesh, (jnp.asarray(imgs), jnp.asarray(neigh),
                                      jnp.asarray(cell)))
        return jnp.asarray(imgs), jnp.asarray(neigh), jnp.asarray(cell)

    step_fn = _make_step(apply_fn, tx, cfg.loss, cfg.augment)
    aug_rng = jax.random.PRNGKey(cfg.seed + 7)
    eval_fn = _eval_loss(apply_fn, cfg.loss)
    plateau = ReduceLROnPlateau(factor=0.25, patience=8,
                                min_lr_scale=6e-5 / lr)

    save_sidecar(model_dir, {
        "model_name": cfg.model_name,
        "architecture": {"channels": list(cfg.channels), "act": cfg.act,
                         "norm": cfg.norm, "pool": cfg.pool},
        "num_class": 1,
        "input_size": crop,
        "in_channels": 1,
        "dtype": cfg.dtype,
        "loss": cfg.loss,
        "optimizer": cfg.optimizer,
        "framework": "cellseg_tpu",
    })

    best_val = float("inf")
    floor_epochs = 0
    history = {"train": [], "val": []}
    t0 = time.time()
    epoch = 0
    for epoch in range(1, max_epochs + 1):
        scale = plateau.scale
        state = state.replace(
            opt_state=set_learning_rate(state.opt_state, lr * scale))
        losses = []
        for imgs, neigh, cell in train_ds.batches(cfg.batch_size):
            aug_rng, step_rng = jax.random.split(aug_rng)
            imgs, neigh, cell = place(imgs, neigh, cell)
            state, loss = step_fn(state, imgs, neigh, cell, step_rng)
            losses.append(loss)
        train_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0

        val_losses = [
            float(eval_fn(state.params, jnp.asarray(i), jnp.asarray(n),
                          jnp.asarray(c)))
            for i, n, c in val_ds.batches(cfg.batch_size, shuffle=False)
        ]
        val_loss = float(np.mean(val_losses)) if val_losses else train_loss
        history["train"].append(train_loss)
        history["val"].append(val_loss)
        print(f"epoch {epoch}: train {train_loss:.5f} val {val_loss:.5f} "
              f"lr_scale {scale:.4f}")

        if val_loss < best_val:
            best_val = val_loss
            save_checkpoint(join(model_dir, "best_model.ckpt"),
                            state.params, step=epoch, epoch=epoch)
        plateau.step(val_loss)
        if plateau.scale <= plateau.min_lr_scale * 1.0001:
            floor_epochs += 1
            if floor_epochs >= cfg.break_condition:
                print(f"LR floor reached; early break at epoch {epoch}")
                break
        else:
            floor_epochs = 0

    # Ranger second phase: cosine fine-tune at 0.09 lr from the best model
    if cfg.optimizer == "ranger":
        from .checkpoint import restore_params

        best_params, _ = restore_params(
            join(model_dir, "best_model.ckpt"), state.params)
        ft_epochs = max_epochs // 10 + 1
        n_batches = max(1, len(train_ds) // cfg.batch_size)
        sched = cosine_finetune_schedule(0.09 * lr, ft_epochs * n_batches)
        tx2 = ranger(learning_rate=sched)
        state = TrainState.create(state.apply_fn, best_params, tx2)
        if n_dev > 1:
            state = state.replace(params=replicate(mesh, state.params),
                                  opt_state=replicate(mesh, state.opt_state))
        step2 = _make_step(apply_fn, tx2, cfg.loss, cfg.augment)
        for e in range(ft_epochs):
            for imgs, neigh, cell in train_ds.batches(cfg.batch_size):
                aug_rng, step_rng = jax.random.split(aug_rng)
                imgs, neigh, cell = place(imgs, neigh, cell)
                state, loss = step2(state, imgs, neigh, cell, step_rng)
            val_losses = [
                float(eval_fn(state.params, jnp.asarray(i), jnp.asarray(n),
                              jnp.asarray(c)))
                for i, n, c in val_ds.batches(cfg.batch_size, shuffle=False)
            ]
            val_loss = float(np.mean(val_losses)) if val_losses else 0.0
            print(f"finetune epoch {e + 1}: val {val_loss:.5f}")
            if val_loss < best_val:
                best_val = val_loss
                save_checkpoint(join(model_dir, "best_model.ckpt"),
                                state.params, step=epoch + e, epoch=epoch + e)

    np.savez_compressed(join(model_dir, "loss_history.npz"),
                        train=np.asarray(history["train"]),
                        val=np.asarray(history["val"]))
    return {
        "best_val_loss": best_val,
        "epochs_run": epoch,
        "model_path": model_dir,
        "wall_seconds": time.time() - t0,
    }
