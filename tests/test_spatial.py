"""Multi-chip spatial sharding: parity with single-device paths on an
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cellseg_tpu.infer.sliding_window import sliding_window_inference
from cellseg_tpu.parallel.spatial import (
    AXIS,
    pad_for_mesh,
    spatial_decode_mask,
    spatial_label_components,
    spatial_predict,
    spatial_sliding_window,
)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:4]), (AXIS,))


def pointwise_apply(params, tiles):
    return tiles * 3.0 - 1.0


@pytest.mark.slow
def test_spatial_sliding_window_matches_single(mesh):
    rng = np.random.default_rng(0)
    roi, overlap = 64, 0.25
    stride = int(roi * (1 - overlap))
    h, w = 500, 200
    h_pad, w_pad, _ = pad_for_mesh(h, w, 4, roi, stride)
    img = np.zeros((h_pad, w_pad, 3), np.float32)
    img[:h, :w] = rng.random((h, w, 3))

    sharding = NamedSharding(mesh, P(AXIS, None, None))
    dimg = jax.device_put(jnp.asarray(img), sharding)
    got = np.asarray(spatial_sliding_window(
        pointwise_apply, None, dimg, mesh, roi=roi, sw_batch=4,
        overlap=overlap, out_channels=3))
    want = np.asarray(sliding_window_inference(
        pointwise_apply, None, jnp.asarray(img), roi=roi, sw_batch=4,
        overlap=overlap, out_channels=3))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.slow
def test_spatial_decode_mask_matches_host(mesh):
    from cellseg_tpu.ops.host_morphology import (
        remove_small_holes,
        remove_small_objects,
    )
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(1)
    h_pad, w_pad = 256, 128  # 4 stripes of 64 rows
    prob = gaussian_filter(rng.random((h_pad, w_pad)), 3.0)
    prob = ((prob - prob.min()) / (prob.max() - prob.min())).astype(np.float32)

    sharding = NamedSharding(mesh, P(AXIS, None))
    dprob = jax.device_put(jnp.asarray(prob), sharding)
    got = np.asarray(spatial_decode_mask(dprob, mesh))

    mask = prob > 0.5
    want = remove_small_objects(remove_small_holes(mask, 64), 16)
    assert np.array_equal(got, want)


def test_spatial_label_components_matches_scipy(mesh):
    from cellseg_tpu.metrics import relabel_sequential
    from cellseg_tpu.ops.host_morphology import connected_components

    rng = np.random.default_rng(2)
    h_pad, w_pad = 256, 96
    mask = rng.random((h_pad, w_pad)) < 0.4

    sharding = NamedSharding(mesh, P(AXIS, None))
    dmask = jax.device_put(jnp.asarray(mask), sharding)
    got = relabel_sequential(np.asarray(spatial_label_components(dmask, mesh)))
    want = connected_components(mask, connectivity=2)
    assert np.array_equal(got, want)


def test_spatial_predict_end_to_end(mesh):
    """Sharded full pipeline equals the equivalent single-device pipeline."""
    from cellseg_tpu.decode.threeclass import decode_interior_prob_host
    from cellseg_tpu.metrics import relabel_sequential

    rng = np.random.default_rng(3)
    roi, overlap = 64, 0.25
    h, w = 300, 150
    img = rng.random((h, w, 3)).astype(np.float32)

    # fake 3-class "model": logit of class1 = smooth function of input
    def apply_fn(params, tiles):
        g = tiles.mean(-1, keepdims=True)
        return jnp.concatenate([1.0 - g * 4.0, g * 4.0 - 1.0,
                                jnp.zeros_like(g)], axis=-1)

    got = spatial_predict(apply_fn, None, img, mesh, roi=roi, sw_batch=4,
                          overlap=overlap)

    # single-device reference on the identical padded canvas
    stride = int(roi * (1 - overlap))
    from cellseg_tpu.parallel.spatial import pad_for_mesh

    h_pad, w_pad, _ = pad_for_mesh(h, w, 4, roi, stride)
    padded = np.zeros((h_pad, w_pad, 3), np.float32)
    padded[:h, :w] = img
    logits = sliding_window_inference(
        apply_fn, None, jnp.asarray(padded), roi=roi, sw_batch=4,
        overlap=overlap, out_channels=3)
    probs = np.array(jax.nn.softmax(logits, axis=-1))[..., 1]
    probs[h:, :] = 0
    probs[:, w:] = 0
    want = relabel_sequential(decode_interior_prob_host(probs)[:h, :w])
    assert np.array_equal(got, want)


@pytest.mark.slow
def test_spatial_predictor_device_normalization_parity(mesh):
    """SpatialPredictor's on-device percentile normalize + grayscale
    expansion (global stats under sharding) must equal host
    normalization + host channel expansion fed through normalize=False."""
    from cellseg_tpu.parallel.spatial import SpatialPredictor
    from cellseg_tpu.pipeline.normalize import normalize_image

    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (200, 120), dtype=np.uint8)
    img[40:80, 30:70] = 230  # a bright blob so the decode finds something

    def apply_fn(params, tiles):
        g = tiles.mean(-1, keepdims=True)
        return jnp.concatenate([1.0 - g * 4.0, g * 4.0 - 1.0,
                                jnp.zeros_like(g)], axis=-1)

    dev = SpatialPredictor(apply_fn, None, mesh, roi=64, sw_batch=4,
                           normalize=True).predict(img)

    host_norm = normalize_image(img).astype(np.float32)  # (H, W, 3) u8→
    host_norm = host_norm / max(host_norm.max(), 1e-8)
    ref = SpatialPredictor(apply_fn, None, mesh, roi=64, sw_batch=4,
                           normalize=False).predict(host_norm)
    np.testing.assert_array_equal(dev, ref)
    assert dev.max() >= 1


@pytest.mark.slow
def test_spatial_forward_receptive_field_parity(mesh):
    """Bottom-stripe tiles must use the single-chip flush origin, not hang
    `halo` fabricated zero rows past the canvas: with a 3x3 mean-filter
    model (real receptive field) the sharded forward must equal
    sliding_window_inference exactly (same tile set)."""
    def conv_apply(params, tiles):
        k = jnp.ones((3, 3, 1, 1), jnp.float32) / 9.0
        outs = [jax.lax.conv_general_dilated(
            tiles[..., c:c + 1], k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
            for c in range(tiles.shape[-1])]
        return jnp.concatenate(outs, axis=-1)

    rng = np.random.default_rng(11)
    roi, overlap = 64, 0.25
    stride = int(roi * (1 - overlap))
    n_dev = 4
    h, w = 330, 140
    h_pad, w_pad, _ = pad_for_mesh(h, w, n_dev, roi, stride)
    # fill the WHOLE padded canvas: content at the canvas edge is what
    # distinguishes the flush bottom tiles from ghost-overhanging ones
    img = rng.random((h_pad, w_pad, 3)).astype(np.float32)

    sharding = NamedSharding(mesh, P(AXIS, None, None))
    dimg = jax.device_put(jnp.asarray(img), sharding)
    got = np.asarray(spatial_sliding_window(
        conv_apply, None, dimg, mesh, roi=roi, sw_batch=4,
        overlap=overlap, out_channels=3))
    want = np.asarray(sliding_window_inference(
        conv_apply, None, jnp.asarray(img), roi=roi, sw_batch=4,
        overlap=overlap, out_channels=3))
    np.testing.assert_allclose(got, want, atol=1e-5)
