"""Data-parallel training correctness: N-device loss == 1-device loss."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cellseg_tpu.models import build_model
from cellseg_tpu.parallel import make_mesh, replicate, shard_batch
from cellseg_tpu.pipeline.augment import AugmentConfig
from cellseg_tpu.train.steps import TrainState, make_train_step


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
