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


@pytest.mark.slow
def test_16dev_2048_parity_with_single_device():
    """North-star-direction scale (BASELINE.json config #5): a (4, 4) mesh
    of 16 virtual devices on a 2048x2048 canvas must produce EXACTLY the
    single-device instance map (host-morphology reference), and the padded
    canvas must stay < 1.3x pixels (VERDICT r3 item 6).

    Needs 16 devices while conftest forces 8, so the comparison runs in a
    fresh subprocess with its own forced device count.
    """
    import os
    import subprocess
    import sys

    code = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=16"])
import jax
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 16, jax.devices()
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import __graft_entry__ as g
from cellseg_tpu.parallel.spatial2d import (
    SpatialPredictor2D, make_mesh2d, pad_for_mesh2d)
from cellseg_tpu.ops.host_morphology import (
    connected_components, remove_small_holes, remove_small_objects)

size = 2048
img, n_disks = g._make_disk_slide(size, size)
mesh = make_mesh2d(4, 4)
roi, overlap = 256, 0.25
h_pad, w_pad, _, _ = pad_for_mesh2d(size, size, 4, 4, roi,
                                    int(roi * (1 - overlap)))
assert (h_pad * w_pad) / (size * size) < 1.3, (h_pad, w_pad)
pred = SpatialPredictor2D(g._bright_logits_apply, None, mesh, roi=roi,
                          sw_batch=4, overlap=overlap, num_class=3,
                          normalize=False)
got = pred.predict(img)

# single-device reference: the pointwise model's probability map equals
# the input mask exactly, so the host decode chain IS the single-device
# pipeline output (threshold -> hole fill -> object filter -> CC)
mask = img > 0.5
want = connected_components(
    remove_small_objects(remove_small_holes(mask, 64), 16), connectivity=2)
assert got.shape == want.shape
assert int(got.max()) == n_disks == int(want.max()), (
    int(got.max()), n_disks, int(want.max()))
np.testing.assert_array_equal(got, want)
print("PARITY_OK", n_disks)
"""
    env = dict(os.environ)
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=580,
                          cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "PARITY_OK" in proc.stdout


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
