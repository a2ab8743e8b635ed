import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellseg_tpu.infer import sliding_window_inference, tile_origins


def test_tile_origins_cover():
    o = tile_origins(500, 256, overlap=0.25)
    assert o[0] == 0 and o[-1] == 500 - 256
    # full coverage
    covered = np.zeros(500, bool)
    for s in o:
        covered[s:s + 256] = True
    assert covered.all()


def test_tile_origins_small_image():
    assert tile_origins(100, 256).tolist() == [0]


def identity_apply(params, tiles):
    # fake "model": returns the tiles' channels as logits
    return tiles * 2.0 + 1.0


@pytest.mark.parametrize("mode", ["constant", "gaussian"])
@pytest.mark.parametrize("shape", [(64, 64), (100, 130), (300, 200)])
def test_blending_reconstructs_pointwise_fn(mode, shape):
    """For a pointwise model, blended output == pointwise fn of the input,
    regardless of tiling/overlap — the defining invariant of the engine."""
    rng = np.random.default_rng(0)
    img = rng.random((*shape, 3)).astype(np.float32)
    out = sliding_window_inference(
        identity_apply, None, jnp.asarray(img), roi=64, sw_batch=4,
        overlap=0.25, out_channels=3, mode=mode,
    )
    np.testing.assert_allclose(np.asarray(out), img * 2.0 + 1.0, atol=1e-4)


def test_matches_whole_image_forward():
    """Conv model on an image == roi: sliding window must equal direct call."""
    from cellseg_tpu.models.unet import UNet

    m = UNet(channels=(4, 8, 16), strides=(2, 2))
    x = jnp.asarray(np.random.default_rng(1).random((96, 96, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x[None])
    apply_fn = lambda p, t: m.apply(p, t)
    sw = sliding_window_inference(apply_fn, params, x, roi=96, sw_batch=2)
    # compare against the jitted forward: op-by-op eager execution fuses
    # differently and instance norms amplify the rounding gap to ~1e-2
    direct = jax.jit(apply_fn)(params, x[None])[0]
    np.testing.assert_allclose(np.asarray(sw), np.asarray(direct), atol=1e-4)


def test_tta_pointwise_equals_plain():
    """For a pointwise model every dihedral view inverse-maps to the same
    canvas, so the TTA average must equal the plain forward exactly — any
    wrong inverse transform (flip axis, rotation sign) breaks equality."""
    from cellseg_tpu.infer.predictor import Predictor

    rng = np.random.default_rng(2)
    img = (rng.random((100, 130)) * 255).astype(np.uint8)

    def apply_fn(params, tiles):
        # 3 fixed "logit" channels, a pointwise function of the input
        g = tiles[..., :1]
        return jnp.concatenate([-g, g, g * 0.5], axis=-1)

    plain = Predictor(apply_fn, None, roi=64, bucket=64, tta=False)
    tta = Predictor(apply_fn, None, roi=64, bucket=64, tta=True)
    np.testing.assert_array_equal(tta.predict(img), plain.predict(img))


def test_tta_runs_on_conv_model():
    """TTA end-to-end smoke on a real (non-equivariant) conv model:
    shapes, dtype, and a sane instance count."""
    from cellseg_tpu.infer.predictor import Predictor
    from cellseg_tpu.models.unet import UNet

    m = UNet(channels=(4, 8), strides=(2,))
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x0)
    img = np.zeros((96, 80), np.uint8)
    img[20:50, 20:50] = 220
    pred = Predictor(lambda p, t: m.apply(p, t), params, roi=64,
                     bucket=64, tta=True)
    labels = pred.predict(img)
    assert labels.shape == (96, 80) and labels.dtype == np.int32
