import jax
import jax.numpy as jnp
import pytest

from cellseg_tpu.models import build_model
from cellseg_tpu.models.swin import SwinUNETR2D, window_partition, window_unpartition
from cellseg_tpu.models.unetr import UNETR2D


def test_unetr_tiny_shapes():
    m = UNETR2D(img_size=64, hidden_size=64, mlp_dim=128, num_heads=4,
                num_layers=4, feature_size=8)
    x = jnp.zeros((1, 64, 64, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (1, 64, 64, 3)
    assert y.dtype == jnp.float32


@pytest.mark.slow
def test_swin_tiny_shapes():
    m = SwinUNETR2D(feature_size=8, depths=(1, 1, 1, 1),
                    num_heads=(1, 2, 4, 8), window_size=4)
    x = jnp.zeros((1, 64, 64, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (1, 64, 64, 3)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 16 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 16, 3)
    w = window_partition(x, 4)
    assert w.shape == (2 * 16, 16, 3)
    back = window_unpartition(w, 4, 16, 16)
    assert jnp.array_equal(back, x)


def test_build_model_dispatch():
    assert build_model("unet").out_channels == 3
    assert isinstance(build_model("unetr", input_size=64), UNETR2D)
    assert isinstance(build_model("swinunetr"), SwinUNETR2D)
    with pytest.raises(ValueError):
        build_model("nope")


@pytest.mark.slow
def test_unetr_debug_intermediates():
    """debug=True returns all encoder/decoder intermediates (reference
    unetr2d.py:175-178)."""
    import jax
    import jax.numpy as jnp

    from cellseg_tpu.models.unetr import UNETR2D

    m = UNETR2D(out_channels=3, img_size=64, feature_size=4, hidden_size=32,
                mlp_dim=64, num_heads=2, num_layers=4, debug=True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out, inter = m.apply(params, x)
    assert out.shape == (1, 64, 64, 3)
    assert set(inter) == {"x1", "x2", "x3", "x4", "bottleneck",
                          "dec4", "dec3", "dec2", "dec1"}
    assert inter["x1"].shape[1:3] == (64, 64)
    assert inter["bottleneck"].shape[1:3] == (4, 4)
