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
from ..pipeline.flow_labels import masks_to_flows, masks_to_flows_omni
from .checkpoint import save_checkpoint, save_sidecar
from .data import split_train_val
from .losses import flow_loss, omni_flow_loss
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
    # omnipose-representation head: flow targets are the gradient of the
    # distance-to-boundary field, plus regressed distance + boundary
    # channels (pipeline/flow_labels.masks_to_flows_omni; the reference's
    # omnipose capability, test_omnipose_cyto2_grey.py:23-28)
    omni: bool = False


class FlowCropDataset:
    """Random crops of (grey image, flow target, cell mask) — or, with
    omni=True, (grey, flow, dist, boundary) from the omnipose-representation
    targets (channel layout (H, W, 5): grey, fy, fx, dist, boundary; the
    dihedral augmentation below transforms only the vector channels 1:3,
    which holds for both layouts)."""

    def __init__(self, files, input_size: int, seed: int = 2022,
                 omni: bool = False):
        from .data import load_pair, pad_to_min

        self.omni = omni
        self.samples = []
        for img_f, lbl_f in files:
            s = load_pair(img_f, lbl_f)
            grey = s.image.mean(axis=-1).astype(np.float32)
            lo, hi = grey.min(), grey.max()
            grey = (grey - lo) / max(hi - lo, 1e-9)
            lbl = np.asarray(s.label).astype(np.int32)
            if omni:
                flow, dist, boundary = masks_to_flows_omni(lbl)
                planes = [grey[None], flow, dist[None],
                          boundary[None].astype(np.float32)]
            else:
                flow, mask = masks_to_flows(lbl)
                planes = [grey[None], flow, mask[None].astype(np.float32)]
            stack = np.moveaxis(np.concatenate(planes, axis=0), 0, -1)
            # dist is -1 on background but pad_to_min zero-pads
            # (symmetrically, MONAI SpatialPadd); re-impose the background
            # value on the padded frame so the mask head doesn't learn a
            # dist=0 halo at crop edges
            h0, w0 = stack.shape[:2]
            stack = pad_to_min(stack, input_size)
            if omni and stack.shape[:2] != (h0, w0):
                ph, pw = stack.shape[0] - h0, stack.shape[1] - w0
                padmask = np.ones(stack.shape[:2], bool)
                padmask[ph // 2:ph // 2 + h0, pw // 2:pw // 2 + w0] = False
                stack[..., 3] = np.where(padmask, -1.0, stack[..., 3])
            self.samples.append(stack)
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
            if self.omni:
                # (grey, flow, dist, boundary)
                yield (b[..., :1], b[..., 1:3], b[..., 3], b[..., 4] > 0.5)
            else:
                yield (b[..., :1], b[..., 1:3], b[..., 3] > 0.5)


def train_flow(cfg: FlowTrainConfig) -> dict:
    model_dir = join(cfg.work_dir,
                     f"{cfg.model_name}_{'omni' if cfg.omni else 'flow'}")
    os.makedirs(model_dir, exist_ok=True)

    img_path = join(cfg.data_path, "images")
    gt_path = join(cfg.data_path, "labels")
    train_files, val_files = split_train_val(
        img_path, gt_path, seed=cfg.seed, val_frac=cfg.val_frac,
        label_suffix="_label.tiff")
    if not val_files:
        val_files = train_files[:1]
    train_ds = FlowCropDataset(train_files, cfg.input_size, cfg.seed,
                               omni=cfg.omni)
    val_ds = FlowCropDataset(val_files, cfg.input_size, cfg.seed + 1,
                             omni=cfg.omni)

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = build_model(cfg.model_name, dtype=dtype, channels=cfg.channels,
                        omni=cfg.omni)
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
            if bool(side.get("architecture", {}).get("omni",
                                                     False)) != cfg.omni:
                raise ValueError(
                    "Head of model to retrain does not match: omni="
                    f"{side.get('architecture', {}).get('omni', False)} "
                    f"vs {cfg.omni}")
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

    def place(*arrays):
        batch = tuple(jnp.asarray(a) for a in arrays)
        if n_dev > 1 and batch[0].shape[0] % n_dev == 0:
            return shard_batch(mesh, batch)
        return batch

    def batch_loss(p, batch):
        if cfg.omni:
            imgs, flows, dists, boundaries = batch
            pred_flow, aux = model.apply(p, imgs)
            return omni_flow_loss(pred_flow, aux, flows, dists, boundaries)
        imgs, flows, masks = batch
        pred_flow, cellprob = model.apply(p, imgs)
        return flow_loss(pred_flow, cellprob, flows, masks)

    @jax.jit
    def step(state, batch):
        loss, grads = jax.value_and_grad(batch_loss)(state.params, batch)
        return state.apply_gradients(grads), loss

    @jax.jit
    def eval_step(params, batch):
        return batch_loss(params, batch)

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
        "architecture": {"channels": list(cfg.channels), "omni": cfg.omni},
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
        for batch in train_ds.batches(cfg.batch_size, steps_per_epoch):
            state, loss = step(state, place(*batch))
            losses.append(loss)
        train_loss = float(jnp.mean(jnp.stack(losses)))
        vals = [
            float(eval_step(state.params,
                            tuple(jnp.asarray(a) for a in batch)))
            for batch in val_ds.batches(cfg.batch_size, 2, augment=False)
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
