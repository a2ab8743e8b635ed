"""Autoencoder pretraining (KIT-GE train_auto capability).

Reconstruction pretraining of the shared encoder on unlabeled crops
(reference segmentation/training/training.py:276-376: 60 epochs, MSE),
then encoder-weight transfer into DUNet (train.py:149-158). Both nets use
the same `UNetEncoder` flax scope, so the transfer is a subtree copy.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.unet import AutoUNet
from .steps import TrainState

join = os.path.join


def _subsample_frames(files: list[str], rs: np.random.RandomState,
                      cap: int = 15) -> list[str]:
    """CTC-sequence frame subsampling (reference autoencoder_dataset.py:25-45
    semantics): drop the sparse early frames of very long sequences
    (first 1500 / 1000 for >1500- / >1000-frame sequences), stride-5
    decimate down to ≤75, then randomly cap at `cap` frames. Operates on
    file NAMES only — nothing is read here."""
    files = sorted(files)
    if len(files) > 1500:
        files = files[1500:]
    elif len(files) > 1000:
        files = files[1000:]
    while len(files) > 75:
        files = files[::5]
    if len(files) > cap:
        idx = rs.permutation(len(files))[:cap]
        files = [files[i] for i in sorted(idx)]
    return files


def load_pretrain_corpus(data_dir: str, seed: int = 2022,
                         cap_per_subset: int = 15) -> list[np.ndarray]:
    """Load an autoencoder-pretraining corpus from a CTC-layout directory
    (<data_dir>/01/*.tif, <data_dir>/02/*.tif) with the reference's frame
    subsampling, WITHOUT reading unselected frames. 3D frames are kept as
    volumes; `train_auto` draws random above-mean z-slices per sample.
    Subsets with mismatching frame shapes fall back to subset 01 alone
    (reference autoencoder_dataset.py:47-51). Images are min-max scaled
    to [-1, 1] per frame."""
    from ..io import imread

    rs = np.random.RandomState(seed)
    per_subset = []
    for sub in ("01", "02"):
        d = join(data_dir, sub)
        if not os.path.isdir(d):
            continue
        files = [join(d, f) for f in os.listdir(d)
                 if f.lower().endswith((".tif", ".tiff", ".png"))]
        if not files:
            continue
        frames = [np.asarray(imread(f)) for f in
                  _subsample_frames(files, rs, cap_per_subset)]
        per_subset.append(frames)
    if not per_subset:
        raise FileNotFoundError(f"no CTC subsets under {data_dir}")
    if (len(per_subset) == 2
            and per_subset[0][0].shape != per_subset[1][0].shape):
        print("Subsets 01 and 02 have different sizes")
        per_subset = per_subset[:1]
    out = []
    for frames in per_subset:
        for im in frames:
            im = im.astype(np.float32)
            lo, hi = im.min(), im.max()
            out.append((im - lo) / max(hi - lo, 1e-9) * 2.0 - 1.0)
    return out


def _draw_plane(im: np.ndarray, rs: np.random.RandomState) -> np.ndarray:
    """2D frame → itself; 3D volume → a random z-slice, re-drawn (≤10
    times) while the slice is dimmer than the volume mean (the reference's
    heuristic for skipping empty z-planes, autoencoder_dataset.py:70-77)."""
    if im.ndim == 2:
        return im
    if im.shape[-1] <= 4 and im.shape[0] > 4:
        # channel-last RGB(A) frame, not a z-stack: collapse to luminance
        # (slicing axis 0 would shred it into (W, C) slivers)
        return im[..., :3].mean(axis=-1)
    mean = float(im.mean())
    z = rs.randint(im.shape[0])
    for _ in range(10):
        if float(im[z].mean()) >= mean:
            break
        z = rs.randint(im.shape[0])
    return im[z]


def train_auto(images: list[np.ndarray], channels=(64, 128, 256, 512, 1024),
               crop: int = 320, batch_size: int = 8, epochs: int = 60,
               learning_rate: float = 8e-4, seed: int = 2022,
               dtype=jnp.float32, act: str = "relu", norm: str = "group",
               pool: str = "conv"):
    """Pretrain AutoUNet on reconstruction; returns its params.

    images: list of (H, W) — or (Z, H, W), see _draw_plane — float arrays
    already scaled to [-1, 1]. act/norm must match the downstream model so
    the encoder subtree transfers (prelu carries learned parameters).
    """
    model = AutoUNet(channels=channels, dtype=dtype, act=act, norm=norm,
                     pool=pool)
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.zeros((1, crop, crop, 1), jnp.float32))
    tx = optax.adam(learning_rate)
    state = TrainState.create(lambda p, x, train=False: model.apply(p, x),
                              params, tx)

    @jax.jit
    def step(state, batch):
        def loss_fn(p):
            recon = model.apply(p, batch)
            return jnp.mean((recon - batch) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    rs = np.random.RandomState(seed)
    n_steps = max(1, len(images))
    last = 0.0
    for epoch in range(epochs):
        for _ in range(n_steps):
            batch = []
            for _ in range(batch_size):
                im = _draw_plane(images[rs.randint(len(images))], rs)
                h, w = im.shape
                if h < crop or w < crop:
                    pad = np.zeros((max(h, crop), max(w, crop)), im.dtype)
                    pad[:h, :w] = im
                    im, (h, w) = pad, pad.shape
                y = rs.randint(0, h - crop + 1)
                x = rs.randint(0, w - crop + 1)
                batch.append(im[y:y + crop, x:x + crop])
            b = jnp.asarray(np.stack(batch)[..., None], jnp.float32)
            state, loss = step(state, b)
            last = float(loss)
        if epoch % 10 == 0:
            print(f"auto epoch {epoch}: recon loss {last:.5f}")
    return state.params, last


def transfer_encoder(pretrained_params, target_params):
    """Copy the UNetEncoder subtree from AutoUNet params into a DUNet/UNet
    param tree (matching scope names)."""
    src = pretrained_params["params"]
    dst = jax.tree.map(lambda x: x, target_params)  # shallow copy tree
    enc_keys = [k for k in src if k.startswith("UNetEncoder")]
    new_params = dict(dst["params"])
    for k in enc_keys:
        if k in new_params:
            new_params[k] = src[k]
    return {**dst, "params": new_params}
