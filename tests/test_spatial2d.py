"""2-D (rows × cols) spatial mesh: parity with single-device paths on a
(2, 4) block mesh of the 8 virtual CPU devices (VERDICT r2 item 8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cellseg_tpu.infer.sliding_window import sliding_window_inference
from cellseg_tpu.parallel.spatial2d import (
    AXX,
    AXY,
    make_mesh2d,
    pad_for_mesh2d,
    spatial_decode_mask_2d,
    spatial_label_components_2d,
    spatial_sliding_window_2d,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh2d(2, 4)


def pointwise_apply(params, tiles):
    return tiles * 3.0 - 1.0


@pytest.mark.slow
def test_forward_matches_single(mesh):
    rng = np.random.default_rng(0)
    roi, overlap = 64, 0.25
    stride = int(roi * (1 - overlap))
    h, w = 200, 500  # wide-short: the 1-D engine's bad case
    h_pad, w_pad, _, _ = pad_for_mesh2d(h, w, 2, 4, roi, stride)
    img = np.zeros((h_pad, w_pad, 3), np.float32)
    img[:h, :w] = rng.random((h, w, 3))

    sharding = NamedSharding(mesh, P(AXY, AXX, None))
    dimg = jax.device_put(jnp.asarray(img), sharding)
    got = np.asarray(spatial_sliding_window_2d(
        pointwise_apply, None, dimg, mesh, roi=roi, sw_batch=4,
        overlap=overlap, out_channels=3))
    want = np.asarray(sliding_window_inference(
        pointwise_apply, None, jnp.asarray(img), roi=roi, sw_batch=4,
        overlap=overlap, out_channels=3))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.slow
def test_decode_mask_matches_host(mesh):
    from scipy.ndimage import gaussian_filter

    from cellseg_tpu.ops.host_morphology import (
        remove_small_holes,
        remove_small_objects,
    )

    rng = np.random.default_rng(1)
    h_pad, w_pad = 160, 320  # (2, 4) blocks of 80×80
    prob = gaussian_filter(rng.random((h_pad, w_pad)), 3.0)
    prob = ((prob - prob.min()) / (prob.max() - prob.min())).astype(np.float32)

    sharding = NamedSharding(mesh, P(AXY, AXX))
    dprob = jax.device_put(jnp.asarray(prob), sharding)
    got = np.asarray(spatial_decode_mask_2d(dprob, mesh))

    mask = prob > 0.5
    want = remove_small_objects(remove_small_holes(mask, 64), 16)
    assert np.array_equal(got, want)


def test_label_components_matches_scipy(mesh):
    from cellseg_tpu.metrics import relabel_sequential
    from cellseg_tpu.ops.host_morphology import connected_components

    rng = np.random.default_rng(2)
    h_pad, w_pad = 128, 256
    mask = rng.random((h_pad, w_pad)) < 0.4

    sharding = NamedSharding(mesh, P(AXY, AXX))
    dmask = jax.device_put(jnp.asarray(mask), sharding)
    got = relabel_sequential(
        np.asarray(jax.device_get(spatial_label_components_2d(dmask, mesh))))
    want = connected_components(mask, connectivity=2)
    np.testing.assert_array_equal(got, want)


def test_wide_slide_padding_ratio():
    """1024×16384 on a (2, 4) mesh must not over-pad: <1.25x pixels, vs
    ~3x for the 1-D row engine on 8 devices (spatial.py:46-63)."""
    from cellseg_tpu.parallel.spatial import pad_for_mesh

    roi, stride = 256, 192
    h, w = 1024, 16384
    h2, w2, _, _ = pad_for_mesh2d(h, w, 2, 4, roi, stride)
    ratio_2d = (h2 * w2) / (h * w)
    h1, w1, _ = pad_for_mesh(h, w, 8, roi, stride)
    ratio_1d = (h1 * w1) / (h * w)
    assert ratio_2d < 1.25, (h2, w2, ratio_2d)
    assert ratio_2d < ratio_1d / 2, (ratio_2d, ratio_1d)


@pytest.mark.slow
def test_predictor2d_end_to_end(mesh):
    """Full SpatialPredictor2D pipeline on a (2, 4) mesh vs the host
    decode of the same (pointwise) probability map."""
    from cellseg_tpu.parallel.spatial2d import SpatialPredictor2D

    rng = np.random.default_rng(3)
    h, w = 130, 400
    img = np.zeros((h, w), np.uint8)
    for cy, cx in [(30, 40), (30, 120), (90, 200), (60, 330), (100, 60)]:
        yy, xx = np.mgrid[0:h, 0:w]
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= 15 ** 2] = 200

    # identity "model": logits favoring interior where bright
    def apply_fn(params, tiles):
        bright = tiles[..., :1] > 0.5
        logit = jnp.where(bright, 8.0, -8.0)
        return jnp.concatenate([-logit, logit, jnp.full_like(logit, -8.0)],
                               axis=-1)

    pred = SpatialPredictor2D(apply_fn, None, mesh, roi=64, sw_batch=4,
                              num_class=3, normalize=True)
    labels = pred.predict(img)
    assert labels.shape == (h, w)
    assert labels.max() == 5  # each disk one instance
    # instances must be exactly the bright disks
    assert np.array_equal(labels > 0, img > 0)


def conv_apply(params, tiles):
    """3x3 mean filter per channel: a REAL receptive field, so tile-window
    membership changes the output near tile borders — exercises the
    flush-origin edge tiles (parity requires the exact single-chip grid)."""
    k = jnp.ones((3, 3, 1, 1), jnp.float32) / 9.0
    outs = [jax.lax.conv_general_dilated(
        tiles[..., c:c + 1], k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
        for c in range(tiles.shape[-1])]
    return jnp.concatenate(outs, axis=-1)


@pytest.mark.slow
def test_forward_matches_single_with_receptive_field(mesh):
    """Edge tiles must use the single-chip flush origins, not hang past
    the canvas into zero ghosts (exact tile-set parity)."""
    rng = np.random.default_rng(7)
    roi, overlap = 64, 0.25
    stride = int(roi * (1 - overlap))
    h, w = 180, 420
    h_pad, w_pad, _, _ = pad_for_mesh2d(h, w, 2, 4, roi, stride)
    # fill the WHOLE padded canvas: content at the canvas edge is what
    # distinguishes flush edge tiles from ghost-overhanging ones
    img = rng.random((h_pad, w_pad, 3)).astype(np.float32)

    sharding = NamedSharding(mesh, P(AXY, AXX, None))
    dimg = jax.device_put(jnp.asarray(img), sharding)
    got = np.asarray(spatial_sliding_window_2d(
        conv_apply, None, dimg, mesh, roi=roi, sw_batch=4,
        overlap=overlap, out_channels=3))
    want = np.asarray(sliding_window_inference(
        conv_apply, None, jnp.asarray(img), roi=roi, sw_batch=4,
        overlap=overlap, out_channels=3))
    np.testing.assert_allclose(got, want, atol=1e-5)
