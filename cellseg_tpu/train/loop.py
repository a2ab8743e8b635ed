"""3-class training loop: epochs, validation, early stop, checkpoints.

Behavioral parity with the reference loop (model_training_3class.py:238-341):
DiceCE + AdamW, val every `val_interval` epochs after epoch 20 with 256²
sliding-window inference and foreground Dice, best-Dice checkpointing, early
stop after `epoch_tolerance` non-improving epochs, final checkpoint +
train_log.npz history.

TPU-first differences: augmentation runs inside the jitted train step, the
loss is only synced to host once per epoch (the reference syncs per step),
and the batch is sharded over the ICI data-parallel mesh when more than one
device is present.
"""

from __future__ import annotations

import dataclasses
import os
import time
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..infer.sliding_window import sliding_window_inference
from ..models import build_model
from ..parallel import make_mesh, replicate, shard_batch
from ..pipeline.augment import AugmentConfig
from ..utils.log import ScalarLogger
from .checkpoint import save_checkpoint, save_sidecar
from .data import CropDataset, load_pair, prefetch, split_train_val
from .steps import TrainState, make_train_step

join = os.path.join


@dataclasses.dataclass
class TrainConfig:
    data_path: str = "./data/Train_Pre_3class/"
    work_dir: str = "./work_dir"
    seed: int = 2022
    model_name: str = "unet"
    num_class: int = 3
    input_size: int = 256
    batch_size: int = 8
    max_epochs: int = 2000
    val_interval: int = 2
    epoch_tolerance: int = 100
    initial_lr: float = 6e-4
    min_val_epoch: int = 20
    val_frac: float = 0.1
    n_devices: int | None = None
    dtype: str = "float32"
    augment: bool = True
    resume: str | None = None  # checkpoint path to resume from
    # rolling-checkpoint cadence: every ckpt_interval epochs a resumable
    # {params, opt_state, epoch} snapshot is written to last_model.ckpt, so
    # --resume loses at most ckpt_interval epochs after a crash (reference
    # cadence: every epoch, model_training_3class.py:269-274)
    ckpt_interval: int = 1
    # >1 fuses K train steps into ONE lax.scan dispatch (numerically
    # equivalent to K sequential dispatches — same crops, same rng keys,
    # same update sequence, differing only by float reassociation across
    # compilation variants); amortizes the per-dispatch host round-trip, which
    # dominates on tunneled/remote device links (bench.py --pipeline train
    # measured ~110 ms/dispatch for ~1 ms of device compute)
    steps_per_dispatch: int = 1


def _foreground_dice(pred_onehot: np.ndarray, gt_onehot: np.ndarray) -> float:
    """Mean over foreground classes of Dice (MONAI include_background=False)."""
    dices = []
    for c in range(1, gt_onehot.shape[-1]):
        p, g = pred_onehot[..., c], gt_onehot[..., c]
        denom = p.sum() + g.sum()
        if denom == 0:
            continue
        dices.append(2.0 * (p * g).sum() / denom)
    return float(np.mean(dices)) if dices else float("nan")


def validate(apply_fn, params, val_pairs, roi: int, num_class: int,
             sw_batch: int = 4, logger=None, epoch: int = 0) -> float:
    """Whole-image sliding-window validation Dice, averaged over images."""
    scores = []
    for i, (img, lbl) in enumerate(val_pairs):
        x = jnp.asarray(img.astype(np.float32) / 255.0)
        logits = sliding_window_inference(
            apply_fn, params, x, roi=roi, sw_batch=sw_batch,
            out_channels=num_class,
        )
        probs = jax.nn.softmax(logits, axis=-1)
        pred = np.asarray(probs > 0.5)
        gt = np.eye(num_class, dtype=np.float32)[lbl.astype(np.int64)]
        scores.append(_foreground_dice(pred, gt))
        if logger is not None and i == 0:
            # snapshot the first val case (reference plot_2d_or_3d_image)
            logger.image("val/image", img, epoch)
            logger.image("val/label", lbl, epoch)
            logger.image("val/output", pred.argmax(-1), epoch)
    return float(np.nanmean(scores))


def train_3class(cfg: TrainConfig) -> dict:
    model_path = join(cfg.work_dir, cfg.model_name + "_3class")
    os.makedirs(model_path, exist_ok=True)

    img_path = join(cfg.data_path, "images")
    gt_path = join(cfg.data_path, "labels")
    train_files, val_files = split_train_val(
        img_path, gt_path, seed=cfg.seed, val_frac=cfg.val_frac
    )
    print(f"training image num: {len(train_files)}, "
          f"validation image num: {len(val_files)}")

    train_ds = CropDataset(train_files, input_size=cfg.input_size, seed=cfg.seed)
    val_pairs = []
    for i, g in val_files:
        s = load_pair(i, g)
        val_pairs.append((s.image, np.asarray(s.label)))

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = build_model(cfg.model_name, num_class=cfg.num_class,
                        input_size=cfg.input_size, dtype=dtype)
    rng = jax.random.PRNGKey(cfg.seed)
    dummy = jnp.zeros((1, cfg.input_size, cfg.input_size, 3), jnp.float32)
    params = model.init(rng, dummy)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"model {cfg.model_name}: {n_params:,} params")

    tx = optax.adamw(cfg.initial_lr)
    apply_fn = lambda p, x, train=False: model.apply(p, x, train=train)
    state = TrainState.create(apply_fn, params, tx)

    start_epoch = 1
    if cfg.resume:
        # first-class resume (the reference's was commented out,
        # model_training_3class.py:64)
        from flax import serialization

        from .checkpoint import load_checkpoint

        payload = load_checkpoint(cfg.resume)
        params = serialization.from_state_dict(params, payload["params"])
        state = state.replace(params=params)
        if "opt_state" in payload:
            opt_state = serialization.from_state_dict(
                state.opt_state, payload["opt_state"])
            state = state.replace(opt_state=opt_state)
        start_epoch = int(payload.get("epoch", 0)) + 1
        print(f"resumed from {cfg.resume} at epoch {start_epoch}")

    # use the largest device count that divides the global batch
    n_avail = cfg.n_devices or len(jax.devices())
    n_dev = max(d for d in range(1, n_avail + 1) if cfg.batch_size % d == 0)
    mesh = make_mesh(n_dev)
    if n_dev > 1:
        print(f"data-parallel over {n_dev} devices")
    state = jax.tree.map(jnp.asarray, state)
    if n_dev > 1:
        state = state.replace(
            params=replicate(mesh, state.params),
            opt_state=replicate(mesh, state.opt_state),
        )

    step_fn = make_train_step(
        num_classes=cfg.num_class,
        augment=AugmentConfig() if cfg.augment else None,
    )
    fused_k = max(int(cfg.steps_per_dispatch), 1)
    fused_fn = None
    if fused_k > 1:
        from .steps import make_fused_train_step

        fused_fn = make_fused_train_step(
            num_classes=cfg.num_class,
            augment=AugmentConfig() if cfg.augment else None,
        )

    save_sidecar(model_path, {
        "model_name": cfg.model_name,
        "num_class": cfg.num_class,
        "input_size": cfg.input_size,
        "in_channels": 3,
        "dtype": cfg.dtype,
        "framework": "cellseg_tpu",
        # full run provenance (the reference self-copies the training
        # script, model_training_3class.py:90-93)
        "train_config": dataclasses.asdict(cfg),
        "n_params": int(n_params),
        "n_devices": int(n_dev),
    })

    logger = ScalarLogger(model_path)
    best_metric, best_metric_epoch = -1.0, -1
    epoch_loss_values, metric_values = [], []
    eval_apply = lambda p, t: model.apply(p, t)
    global_step = 0
    t_start = time.time()

    def dispatch_group(state, group):
        """Run len(group) steps in ONE fused scan dispatch (full groups)
        or singly (the epoch tail) — equivalent numerics either way."""
        if fused_fn is not None and len(group) == fused_k:
            imgs_k = np.stack([g[0] for g in group])
            lbls_k = np.stack([g[1] for g in group])
            rngs_k = jnp.stack([g[2] for g in group])
            if n_dev > 1:
                # batch axis is now axis 1: shard (K, B, ...) over 'data'
                sh = NamedSharding(mesh, P(None, "data"))
                imgs_k = jax.device_put(imgs_k, sh)
                lbls_k = jax.device_put(lbls_k, sh)
            state, loss_k = fused_fn(state, imgs_k, lbls_k, rngs_k)
            return state, [loss_k]
        out = []
        for imgs, lbls, step_rng in group:
            if n_dev > 1:
                imgs, lbls = shard_batch(mesh, (imgs, lbls))
            state, loss = step_fn(state, imgs, lbls, step_rng)
            out.append(jnp.atleast_1d(loss))
        return state, out

    epoch = start_epoch
    for epoch in range(start_epoch, cfg.max_epochs):
        losses = []
        gen = train_ds.epoch_batches(cfg.batch_size)
        group = []
        for imgs, lbls in prefetch(gen):
            rng, step_rng = jax.random.split(rng)
            group.append((imgs, lbls, step_rng))
            if len(group) == fused_k:
                state, loss_list = dispatch_group(state, group)
                losses.extend(loss_list)
                global_step += len(group)
                group = []
        if group:
            state, loss_list = dispatch_group(state, group)
            losses.extend(loss_list)
            global_step += len(group)
        epoch_loss = float(jnp.mean(jnp.concatenate(
            [jnp.atleast_1d(l) for l in losses])))
        epoch_loss_values.append(epoch_loss)
        logger.scalar("train_loss", epoch_loss, global_step)
        print(f"epoch {epoch} average loss: {epoch_loss:.4f}")

        if cfg.ckpt_interval > 0 and epoch % cfg.ckpt_interval == 0:
            save_checkpoint(join(model_path, "last_model.ckpt"),
                            state.params, state.opt_state,
                            step=global_step, epoch=epoch)

        if epoch > cfg.min_val_epoch and epoch % cfg.val_interval == 0 and val_pairs:
            metric = validate(eval_apply, state.params, val_pairs,
                              roi=cfg.input_size, num_class=cfg.num_class,
                              logger=logger, epoch=epoch)
            metric_values.append(metric)
            logger.scalar("val_mean_dice", metric, epoch + 1)
            if metric > best_metric:
                best_metric, best_metric_epoch = metric, epoch + 1
                save_checkpoint(join(model_path, "best_model.ckpt"),
                                state.params, state.opt_state,
                                step=global_step, epoch=epoch)
                print("saved new best metric model")
            print(f"current epoch: {epoch + 1} current mean dice: "
                  f"{metric:.4f} best mean dice: {best_metric:.4f} "
                  f"at epoch {best_metric_epoch}")
            if (epoch - best_metric_epoch) > cfg.epoch_tolerance:
                print(f"validation metric does not improve for "
                      f"{cfg.epoch_tolerance} epochs! stopping at {epoch}")
                break

    save_checkpoint(join(model_path, "final_model.ckpt"),
                    state.params, state.opt_state,
                    step=global_step, epoch=epoch)
    np.savez_compressed(join(model_path, "train_log.npz"),
                        val_dice=np.asarray(metric_values),
                        epoch_loss=np.asarray(epoch_loss_values))
    logger.close()
    wall = time.time() - t_start
    print(f"train completed, best_metric: {best_metric:.4f} at epoch "
          f"{best_metric_epoch}; wall {wall:.1f}s")
    return {
        "best_metric": best_metric,
        "best_metric_epoch": best_metric_epoch,
        "epochs_run": epoch,
        "model_path": model_path,
        "epoch_loss": epoch_loss_values,
        "wall_seconds": wall,
    }
