import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellseg_tpu.models.unet import DUNet, FlowNet, UNet


@pytest.fixture(scope="module")
def small_unet():
    m = UNet(channels=(8, 16, 32), strides=(2, 2), num_res_units=2)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    return m, params


def test_unet_shapes(small_unet):
    m, params = small_unet
    y = m.apply(params, jnp.zeros((2, 64, 64, 3)))
    assert y.shape == (2, 64, 64, 3)
    assert y.dtype == jnp.float32


def test_unet_shift_equivariance_sanity(small_unet):
    """conv net output must respond locally: zero input -> spatially
    constant output; a bump changes outputs near the bump."""
    m, params = small_unet
    base = np.asarray(m.apply(params, jnp.zeros((1, 64, 64, 3))))[0]
    bump = jnp.zeros((1, 64, 64, 3)).at[0, 32, 32, :].set(5.0)
    out = np.asarray(m.apply(params, bump))[0]
    diff = np.abs(out - base).sum(-1)
    assert diff[32, 32] > 1e-4
    assert diff[0, 0] < diff[32, 32]


def test_unet_bf16():
    m = UNet(channels=(8, 16, 32), strides=(2, 2), dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.dtype == jnp.float32  # logits promoted back for the loss


def test_dunet_heads():
    m = DUNet(channels=(8, 16, 32), strides=(2, 2))
    x = jnp.zeros((1, 64, 64, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    border, cell = m.apply(params, x)
    assert border.shape == (1, 64, 64, 1) and cell.shape == (1, 64, 64, 1)


def test_flownet_heads():
    m = FlowNet(channels=(8, 16, 32), strides=(2, 2))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    flow, prob = m.apply(params, x)
    assert flow.shape == (1, 64, 64, 2) and prob.shape == (1, 64, 64, 1)


@pytest.mark.slow
def test_unet_gradients_flow(small_unet):
    m, params = small_unet
    from cellseg_tpu.train.losses import dice_ce_loss

    def loss(p):
        logits = m.apply(p, jnp.ones((1, 64, 64, 3)) * 0.5)
        return dice_ce_loss(logits, jnp.zeros((1, 64, 64), jnp.int32))

    g = jax.grad(loss)(params)
    norms = [float(jnp.abs(x).max()) for x in jax.tree.leaves(g)]
    assert max(norms) > 0
    assert all(np.isfinite(n) for n in norms)


def test_dunet_arch_knobs():
    """Reference build_unet knobs (act_fun/norm/filters ladder,
    unets.py:8-56): the factory accepts them and forward shapes hold."""
    from cellseg_tpu.models import build_model

    m = build_model("dunet", channels=(8, 16, 32), act="mish",
                    norm="instance")
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 1))
    p = m.init(jax.random.PRNGKey(0), x)
    border, cell = m.apply(p, x)
    assert border.shape == (1, 32, 32, 1) and cell.shape == (1, 32, 32, 1)

    # pool_method 'max': same output shapes AND the same parameter tree
    # (the residual 1x1 projection is stride-independent), so checkpoints
    # and pretrained encoders transfer between pool variants
    m2 = build_model("dunet", channels=(8, 16, 32), act="mish",
                     norm="instance", pool="max")
    p2 = m2.init(jax.random.PRNGKey(0), x)
    assert (jax.tree.structure(p) == jax.tree.structure(p2)
            and all(a.shape == b.shape for a, b in
                    zip(jax.tree.leaves(p), jax.tree.leaves(p2))))
    border2, cell2 = m2.apply(p2, x)
    assert border2.shape == (1, 32, 32, 1)
    # and the two modes genuinely differ in computation
    assert not np.allclose(np.asarray(border), np.asarray(border2))


def test_deep_filters_ladder_builds():
    """Reference --filters ladders deeper than 5 levels (e.g. 32→1024)
    must derive a matching strides tuple; a stale 4-entry default would
    desynchronize encoder/decoder resolutions and crash at the skip
    concat."""
    import jax
    import jax.numpy as jnp

    from cellseg_tpu.models import build_model
    from cellseg_tpu.models.unet import AutoUNet

    chans = (8, 16, 32, 64, 128, 256)  # 6 levels
    m = build_model("dunet", channels=chans)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    b, c = m.apply(p, x)
    assert b.shape == (1, 64, 64, 1) and c.shape == (1, 64, 64, 1)

    a = AutoUNet(channels=chans)
    pa = a.init(jax.random.PRNGKey(0), x)
    assert a.apply(pa, x).shape == (1, 64, 64, 1)

    import pytest

    with pytest.raises(ValueError, match="strides"):
        build_model("unet", channels=(8, 16, 32),
                    strides=(2, 2, 2)).init(jax.random.PRNGKey(0), x)
