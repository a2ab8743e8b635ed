"""Flow-field (cellpose-style) training loop.

Capability parity with cellpose model training as invoked by the reference
(cellpose-omnipose-KIT-GE/README.md:34: cellpose CLI retraining — 500
epochs, batch 32, from pretrained cyto2). Targets come from
pipeline/flow_labels.masks_to_flows; the loss is cellpose's MSE-on-flows
(×5) + BCE-on-cellprob (train/losses.flow_loss).
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..io import imread as imread_label
from ..models import build_model
from ..pipeline.flow_labels import masks_to_flows
from .checkpoint import save_checkpoint, save_sidecar
from .data import split_train_val
from .losses import flow_loss
from .steps import TrainState

join = os.path.join


@dataclasses.dataclass
class FlowTrainConfig:
    data_path: str = "./data/Train_Labeled"
    work_dir: str = "./work_dir"
    model_name: str = "flownet"
    channels: tuple = (32, 64, 128, 256)
    input_size: int = 224
    batch_size: int = 8
    max_epochs: int = 500
    learning_rate: float = 2e-4
    seed: int = 2022
    dtype: str = "float32"
    val_frac: float = 0.1
    n_devices: int | None = None  # data-parallel mesh size (None = all)
    # cellpose2-style fine-tuning: warm-start from a pretrained checkpoint
    # (.ckpt file, e.g. assets/pretrained_flow.ckpt, or a model dir with a
    # config.json sidecar). The reference's cellpose2 capability is exactly
    # retraining FROM a pretrained model (cellpose-omnipose-KIT-GE/
    # README.md:34: cellpose CLI, 500 epochs, batch 32, from cyto2).
    pretrained: str | None = None


class FlowCropDataset:
    """Random crops of (grey image, flow target, cell mask)."""

    def __init__(self, files, input_size: int, seed: int = 2022):
        from .data import load_pair, pad_to_min

        self.samples = []
        for img_f, lbl_f in files:
            s = load_pair(img_f, lbl_f)
            grey = s.image.mean(axis=-1).astype(np.float32)
            lo, hi = grey.min(), grey.max()
            grey = (grey - lo) / max(hi - lo, 1e-9)
            flow, mask = masks_to_flows(np.asarray(s.label).astype(np.int32))
            stack = np.concatenate([
                grey[None], flow, mask[None].astype(np.float32)], axis=0)
            stack = np.moveaxis(stack, 0, -1)  # (H, W, 4)
            self.samples.append(pad_to_min(stack, input_size))
        self.input_size = input_size
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.samples)

    @staticmethod
    def _dihedral(crop: np.ndarray, k: int, flip: bool) -> np.ndarray:
        """Apply a dihedral-group element to (H, W, 4) [grey, fy, fx, mask]
        with the matching flow-VECTOR transform (rot90 swaps/negates the
        components; flips negate one): the augmented flow field is exactly
        the field of the augmented mask (cellpose trains with such
        rotation/flip augmentation)."""
        out = crop
        if flip:
            out = out[:, ::-1]  # horizontal flip: x -> -x
            out = np.concatenate([out[..., :1], out[..., 1:2],
                                  -out[..., 2:3], out[..., 3:]], axis=-1)
        for _ in range(k % 4):
            # rot90 CCW: (y, x) -> (-x, y); vectors (fy, fx) -> (-fx, fy)
            out = np.rot90(out, axes=(0, 1))
            out = np.concatenate([out[..., :1], -out[..., 2:3],
                                  out[..., 1:2], out[..., 3:]], axis=-1)
        return np.ascontiguousarray(out)

    def batches(self, batch_size: int, steps: int, augment: bool = True):
        sz = self.input_size
        for _ in range(steps):
            batch = []
            for _ in range(batch_size):
                s = self.samples[self.rng.randint(len(self.samples))]
                y = self.rng.randint(0, s.shape[0] - sz + 1)
                x = self.rng.randint(0, s.shape[1] - sz + 1)
                crop = s[y:y + sz, x:x + sz]
                if augment:
                    crop = self._dihedral(crop, self.rng.randint(4),
                                          bool(self.rng.randint(2)))
                batch.append(crop)
            b = np.stack(batch)
            yield (b[..., :1], b[..., 1:3], b[..., 3] > 0.5)


def train_flow(cfg: FlowTrainConfig) -> dict:
    model_dir = join(cfg.work_dir, f"{cfg.model_name}_flow")
    os.makedirs(model_dir, exist_ok=True)

    img_path = join(cfg.data_path, "images")
    gt_path = join(cfg.data_path, "labels")
    train_files, val_files = split_train_val(
        img_path, gt_path, seed=cfg.seed, val_frac=cfg.val_frac,
        label_suffix="_label.tiff")
    if not val_files:
        val_files = train_files[:1]
    train_ds = FlowCropDataset(train_files, cfg.input_size, cfg.seed)
    val_ds = FlowCropDataset(val_files, cfg.input_size, cfg.seed + 1)

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = build_model(cfg.model_name, dtype=dtype, channels=cfg.channels)
    rng = jax.random.PRNGKey(cfg.seed)
    params = model.init(
        rng, jnp.zeros((1, cfg.input_size, cfg.input_size, 1), jnp.float32))

    if cfg.pretrained:
        # warm-start with architecture check (same contract as the distance
        # trainer's --retrain, distance_loop.py:104-120)
        from .checkpoint import load_sidecar, restore_params

        ckpt_path = cfg.pretrained
        if os.path.isdir(ckpt_path):
            side = load_sidecar(ckpt_path)
            arch = side.get("architecture", {}).get("channels")
            if arch is not None and list(arch) != list(cfg.channels):
                raise ValueError(
                    "Architecture of model to retrain does not match: "
                    f"{arch} vs {list(cfg.channels)}")
            ckpt_path = join(ckpt_path, "best_model.ckpt")
        params, _ = restore_params(ckpt_path, params)
        print(f"warm-starting flow training from {cfg.pretrained}")

    tx = optax.adamw(cfg.learning_rate)
    state = TrainState.create(lambda p, x, train=False: model.apply(p, x),
                              params, tx)

    # data parallelism: replicated params, sharded batch (same recipe as
    # train/loop.py:142-152; the reference's DataParallel analog)
    from ..parallel import make_mesh, replicate, shard_batch

    n_avail = cfg.n_devices or len(jax.devices())
    n_dev = max(d for d in range(1, n_avail + 1) if cfg.batch_size % d == 0)
    mesh = make_mesh(n_dev)
    if n_dev > 1:
        print(f"data-parallel over {n_dev} devices")
        state = state.replace(params=replicate(mesh, state.params),
                              opt_state=replicate(mesh, state.opt_state))

    def place(imgs, flows, masks):
        batch = (jnp.asarray(imgs), jnp.asarray(flows), jnp.asarray(masks))
        if n_dev > 1 and batch[0].shape[0] % n_dev == 0:
            return shard_batch(mesh, batch)
        return batch

    @jax.jit
    def step(state, imgs, flows, masks):
        def loss_fn(p):
            pred_flow, cellprob = model.apply(p, imgs)
            return flow_loss(pred_flow, cellprob, flows, masks)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def eval_step(params, imgs, flows, masks):
        pred_flow, cellprob = model.apply(params, imgs)
        return flow_loss(pred_flow, cellprob, flows, masks)

    # nominal cell diameter of the training set: median equivalent
    # diameter over all GT instances (drives diameter=None auto-rescale
    # at inference, infer/flow_infer.py)
    diams = []
    for _, lbl_f in train_files:
        lbl = np.asarray(imread_label(lbl_f))
        _, counts = np.unique(lbl[lbl > 0], return_counts=True)
        diams.extend(np.sqrt(4.0 * counts / np.pi).tolist())
    diam_mean = float(np.median(diams)) if diams else 30.0

    save_sidecar(model_dir, {
        "model_name": cfg.model_name,
        "architecture": {"channels": list(cfg.channels)},
        "num_class": 3,
        "input_size": cfg.input_size,
        "in_channels": 1,
        "dtype": cfg.dtype,
        "diam_mean": diam_mean,
        "framework": "cellseg_tpu",
    })

    steps_per_epoch = max(1, len(train_ds))
    best_val = float("inf")
    history = []
    t0 = time.time()
    for epoch in range(1, cfg.max_epochs + 1):
        losses = []
        for imgs, flows, masks in train_ds.batches(cfg.batch_size,
                                                   steps_per_epoch):
            imgs, flows, masks = place(imgs, flows, masks)
            state, loss = step(state, imgs, flows, masks)
            losses.append(loss)
        train_loss = float(jnp.mean(jnp.stack(losses)))
        vals = [
            float(eval_step(state.params, jnp.asarray(i), jnp.asarray(f),
                            jnp.asarray(m)))
            for i, f, m in val_ds.batches(cfg.batch_size, 2, augment=False)
        ]
        val_loss = float(np.mean(vals))
        history.append((train_loss, val_loss))
        if val_loss < best_val:
            best_val = val_loss
            save_checkpoint(join(model_dir, "best_model.ckpt"),
                            state.params, step=epoch, epoch=epoch)
        if epoch % 10 == 0 or epoch == 1:
            print(f"flow epoch {epoch}: train {train_loss:.4f} "
                  f"val {val_loss:.4f}")

    save_checkpoint(join(model_dir, "final_model.ckpt"), state.params,
                    step=cfg.max_epochs, epoch=cfg.max_epochs)
    return {
        "best_val_loss": best_val,
        "model_path": model_dir,
        "history": history,
        "wall_seconds": time.time() - t0,
    }
