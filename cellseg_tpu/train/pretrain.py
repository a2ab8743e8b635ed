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


def train_auto(images: list[np.ndarray], channels=(64, 128, 256, 512, 1024),
               crop: int = 320, batch_size: int = 8, epochs: int = 60,
               learning_rate: float = 8e-4, seed: int = 2022,
               dtype=jnp.float32):
    """Pretrain AutoUNet on reconstruction; returns its params.

    images: list of (H, W) float arrays already scaled to [-1, 1].
    """
    model = AutoUNet(channels=channels, dtype=dtype)
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
                im = images[rs.randint(len(images))]
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
