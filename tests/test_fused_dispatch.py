"""Fused multi-step train dispatch (steps_per_dispatch > 1).

The fused path (train/steps.py make_fused_train_step) must be numerically
identical to the per-step dispatch loop: same crops, same rng keys, same
op order inside lax.scan — only the host round-trips are amortized.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax


def _tiny_setup(num_class=3, size=32, batch=2):
    from flax import linen as nn

    from cellseg_tpu.train.steps import TrainState

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3))(x)
            x = nn.relu(x)
            return nn.Conv(num_class, (1, 1))(x)

    model = TinyNet()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 3), jnp.float32))
    tx = optax.adamw(1e-3)
    apply_fn = lambda p, x, train=False: model.apply(p, x)
    state = TrainState.create(apply_fn, params, tx)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (6, batch, size, size, 3), dtype=np.uint8)
    lbls = rng.integers(0, num_class, (6, batch, size, size),
                        dtype=np.int32)
    keys = [jax.random.fold_in(jax.random.PRNGKey(7), i) for i in range(6)]
    return state, imgs, lbls, keys


@pytest.mark.parametrize("augment", [None, "default"])
def test_fused_matches_sequential(augment):
    from cellseg_tpu.pipeline.augment import AugmentConfig
    from cellseg_tpu.train.steps import (make_fused_train_step,
                                         make_train_step)

    aug = AugmentConfig() if augment == "default" else None
    state, imgs, lbls, keys = _tiny_setup()
    k = imgs.shape[0]

    step = make_train_step(num_classes=3, augment=aug, donate=False)
    seq_state = state
    seq_losses = []
    for i in range(k):
        seq_state, loss = step(seq_state, jnp.asarray(imgs[i]),
                               jnp.asarray(lbls[i]), keys[i])
        seq_losses.append(float(loss))

    fused = make_fused_train_step(num_classes=3, augment=aug)
    fused_state, loss_k = fused(state, jnp.asarray(imgs),
                                jnp.asarray(lbls), jnp.stack(keys))

    np.testing.assert_allclose(np.asarray(loss_k), np.asarray(seq_losses),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(seq_state.params),
                    jax.tree.leaves(fused_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert int(fused_state.step) == int(seq_state.step) == k


def test_fused_dataparallel_matches_single(cpu_mesh_guard=None):
    """(K, B) stacked batches sharded over the data axis produce the same
    updates as the single-device fused dispatch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cellseg_tpu.parallel import make_mesh, replicate
    from cellseg_tpu.train.steps import make_fused_train_step

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")

    state, imgs, lbls, keys = _tiny_setup(batch=4)
    fused = make_fused_train_step(num_classes=3, augment=None)

    s1, l1 = fused(state, jnp.asarray(imgs), jnp.asarray(lbls),
                   jnp.stack(keys))

    # `state` was donated into the first dispatch — rebuild it
    # (deterministic: same init key)
    state, _, _, _ = _tiny_setup(batch=4)
    mesh = make_mesh(2)
    state_dp = state.replace(params=replicate(mesh, state.params),
                             opt_state=replicate(mesh, state.opt_state))
    sh = NamedSharding(mesh, P(None, "data"))
    s2, l2 = fused(state_dp, jax.device_put(jnp.asarray(imgs), sh),
                   jax.device_put(jnp.asarray(lbls), sh), jnp.stack(keys))

    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_loop_fused_epoch_matches_plain(tmp_path):
    """train_3class with steps_per_dispatch=3 reproduces the plain loop
    on the same seed (incl. a tail group: 5 batches per epoch = one fused
    group of 3 + 2 singles). Same crops, same rng keys, same update
    sequence — the scan-compiled and standalone-compiled step may fuse
    differently, so allow float-reassociation drift (~1e-7/step, amplified
    by AdamW's normalization to ~1e-4 over 15 steps) but nothing larger
    (a wrong key or crop order moves params at the 1e-2..1e-1 level)."""
    from cellseg_tpu.io.images import imwrite
    from cellseg_tpu.train.checkpoint import load_checkpoint
    from cellseg_tpu.train.loop import TrainConfig, train_3class

    rng = np.random.default_rng(3)
    data = tmp_path / "pre"
    for sub in ("images", "labels"):
        (data / sub).mkdir(parents=True)
    for i in range(10):
        img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        lbl = rng.integers(0, 3, (48, 48)).astype(np.uint8)
        imwrite(str(data / "images" / f"s{i}.png"), img)
        imwrite(str(data / "labels" / f"s{i}_label.png"), lbl)

    outs, logs = {}, {}
    for tag, k in (("plain", 1), ("fused", 3)):
        wd = tmp_path / tag
        cfg = TrainConfig(
            data_path=str(data), work_dir=str(wd), input_size=32,
            batch_size=2, max_epochs=3, val_interval=100,
            min_val_epoch=100, ckpt_interval=0, steps_per_dispatch=k,
            n_devices=1, augment=True,
        )
        train_3class(cfg)
        outs[tag] = load_checkpoint(
            str(wd / "unet_3class" / "final_model.ckpt"))
        logs[tag] = np.load(
            str(wd / "unet_3class" / "train_log.npz"))["epoch_loss"]

    # wrong crops/keys/order would shift the loss history at the 1e-1
    # level immediately; reassociation drift stays orders below
    np.testing.assert_allclose(logs["plain"], logs["fused"],
                               rtol=0, atol=2e-3)
    # params: loose backstop — AdamW amplifies per-step reassociation
    # noise into ~lr-sized sign flips on near-zero-gradient weights
    for a, b in zip(jax.tree.leaves(outs["plain"]["params"]),
                    jax.tree.leaves(outs["fused"]["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-3)
