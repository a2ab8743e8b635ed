import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellseg_tpu.models.unet import AutoUNet, DUNet
from cellseg_tpu.pipeline.augment_distance import augment_distance_batch
from cellseg_tpu.train.pretrain import train_auto, transfer_encoder

pytestmark = pytest.mark.slow


def test_autounet_shapes():
    m = AutoUNet(channels=(8, 16, 32), strides=(2, 2))
    x = jnp.zeros((1, 64, 64, 1))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (1, 64, 64, 1)


def test_train_auto_and_transfer(rng):
    imgs = [rng.normal(0, 0.5, (64, 64)).astype(np.float32) for _ in range(2)]
    pre_params, loss = train_auto(
        imgs, channels=(8, 16, 32), crop=32, batch_size=2, epochs=3)
    assert np.isfinite(loss)

    dunet = DUNet(channels=(8, 16, 32), strides=(2, 2))
    d_params = dunet.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)))
    merged = transfer_encoder(pre_params, d_params)
    # the encoder subtree must now equal the pretrained weights
    src_leaf = jax.tree.leaves(pre_params["params"]["UNetEncoder_0"])[0]
    dst_leaf = jax.tree.leaves(merged["params"]["UNetEncoder_0"])[0]
    assert np.array_equal(np.asarray(src_leaf), np.asarray(dst_leaf))
    # and the merged tree still runs
    b, c = dunet.apply(merged, jnp.zeros((1, 32, 32, 1)))
    assert b.shape == (1, 32, 32, 1)


def test_augment_distance_batch(rng):
    imgs = jnp.asarray(rng.normal(0, 0.5, (2, 64, 64, 1)).astype(np.float32))
    borders = jnp.asarray(rng.random((2, 64, 64, 1)).astype(np.float32))
    cells = jnp.asarray(rng.random((2, 64, 64, 1)).astype(np.float32))
    a_img, a_b, a_c = augment_distance_batch(
        jax.random.PRNGKey(0), imgs, borders, cells)
    assert a_img.shape == imgs.shape
    assert float(a_b.min()) >= 0.0 and float(a_b.max()) <= 1.0
    assert float(a_c.min()) >= 0.0 and float(a_c.max()) <= 1.0
    # flips are p=1.0: geometry must have changed for at least one sample
    assert not np.allclose(np.asarray(a_c), np.asarray(cells))
