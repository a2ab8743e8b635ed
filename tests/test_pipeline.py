import numpy as np
import pytest

from cellseg_tpu.pipeline import (
    create_interior_map,
    normalize_channel,
    normalize_image,
    normalize_image_jax,
)
from cellseg_tpu.ops import (
    find_boundaries_inner,
    remove_small_holes,
    remove_small_objects,
)


def test_normalize_channel_basic(rng):
    img = rng.integers(0, 4000, size=(100, 120)).astype(np.uint16)
    out = normalize_channel(img)
    assert out.dtype == np.uint8
    assert out.max() >= 250  # 99th percentile pushed to the top


def test_normalize_channel_degenerate():
    img = np.full((10, 10), 7, dtype=np.uint8)
    out = normalize_channel(img)
    assert np.array_equal(out, img)  # p99 - p1 == 0 -> passthrough


def test_normalize_image_channel_fixup(rng):
    grey = rng.integers(0, 255, size=(32, 32)).astype(np.uint8)
    out = normalize_image(grey)
    assert out.shape == (32, 32, 3)
    assert np.array_equal(out[..., 0], out[..., 1])

    four = rng.integers(0, 255, size=(32, 32, 4)).astype(np.uint8)
    assert normalize_image(four).shape == (32, 32, 3)


def test_normalize_jax_matches_host(rng, bundled_samples):
    import jax.numpy as jnp

    for name, img, _ in bundled_samples:
        # center-crop to one shared shape: parity holds per-pixel, and one
        # shape = one compile of the histogram program (the full-size
        # variants cost 3 compiles and dominated the default tier)
        h, w = img.shape[:2]
        s = min(h, w, 200)
        img = img[(h - s) // 2:(h + s) // 2, (w - s) // 2:(w + s) // 2]
        host = normalize_image(img)
        if img.ndim == 2:
            img3 = np.repeat(img[..., None], 3, axis=-1)
        else:
            img3 = img[:, :, :3]
        dev = np.asarray(normalize_image_jax(jnp.asarray(img3)))
        # identical up to float-percentile rounding at bin edges
        diff = np.abs(host.astype(int) - dev.astype(int))
        assert diff.max() <= 1, (name, diff.max())
        assert (diff > 0).mean() < 0.02, name


def test_find_boundaries_inner_hand_case():
    lbl = np.zeros((7, 7), dtype=np.int16)
    lbl[2:5, 2:5] = 1
    b = find_boundaries_inner(lbl)
    # ring of the 3x3 block is boundary, center is not
    assert b[2, 2] and b[2, 4] and b[4, 4]
    assert not b[3, 3]
    assert not b[0, 0]


def test_find_boundaries_between_touching_cells():
    lbl = np.zeros((6, 8), dtype=np.int16)
    lbl[1:5, 1:4] = 1
    lbl[1:5, 4:7] = 2
    b = find_boundaries_inner(lbl)
    assert b[2, 3] and b[2, 4]  # touching column is boundary on both sides


def test_remove_small_objects_strict_threshold():
    m = np.zeros((20, 20), dtype=bool)
    m[1:5, 1:5] = True      # 16 px -> kept (>= min_size)
    m[10:13, 10:15] = True  # 15 px -> removed
    out = remove_small_objects(m, min_size=16)
    assert out[2, 2] and not out[11, 11]


def test_remove_small_holes():
    m = np.ones((20, 20), dtype=bool)
    m[5:7, 5:7] = False     # 4-px hole -> filled
    m[0, 0] = False         # border background: part of outside, small here
    out = remove_small_holes(m, area_threshold=64)
    assert out[5, 5]


def test_interior_map_classes(bundled_samples):
    for name, _, lbl in bundled_samples:
        tri = create_interior_map(lbl.astype(np.int16))
        vals = set(np.unique(tri).tolist())
        assert vals <= {0, 1, 2}, name
        assert 1 in vals and 2 in vals, name
        # interior pixels must lie inside instances
        assert (lbl[tri == 1] > 0).all(), name


def test_interior_map_hand_case():
    lbl = np.zeros((12, 12), dtype=np.int16)
    lbl[2:10, 2:10] = 1  # 8x8 cell
    tri = create_interior_map(lbl)
    # interior survives (inner 4x4 block = 16 px after 2-px boundary ring)
    assert (tri[4:8, 4:8] == 1).all()
    assert tri[2, 2] == 2
    assert tri[0, 0] == 0


def test_histogram_grouped_accumulation_matches_bincount():
    """The grouped int32 accumulation (gigapixel-exactness fix: f32
    einsum counts are only exact to 2^24) must equal np.bincount for any
    group size, including groups that force row padding."""
    import jax.numpy as jnp

    from cellseg_tpu.pipeline.normalize import _histogram_256

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 256, 128 * 37, dtype=np.int32)  # cols=128 path
    want = np.bincount(vals, minlength=256)
    for group in (1 << 23, 256, 129):  # default, small, pad-forcing
        got = np.asarray(_histogram_256(jnp.asarray(vals), group))
        # bin 0 absorbs the zero-row padding by contract (the
        # nonzero-percentile caller zeroes it); bins 1..255 must be exact
        np.testing.assert_array_equal(got[1:], want[1:], err_msg=str(group))


def test_normalize_degenerate_uint16_wrap_parity():
    """Degenerate percentile range passes through with uint8-cast (wrap
    mod 256) semantics on device, matching the host normalize_channel."""
    import jax.numpy as jnp

    from cellseg_tpu.pipeline.normalize import (
        normalize_channel,
        normalize_image_jax,
    )

    ch = np.full((64, 64), 300, np.uint16)
    ch[0, 0] = 0  # keep a zero so nonzero-percentile path engages
    host = normalize_channel(ch)
    dev = np.asarray(normalize_image_jax(
        jnp.asarray(ch[..., None].astype(np.uint16))))[..., 0]
    assert host[1, 1] == 44  # 300 % 256
    np.testing.assert_array_equal(dev, host)


def test_flow_targets_border_cells_not_degenerate():
    """Cells overlapping the image frame get one-sided log-heat
    gradients there — not a zeroed row that strands decode pixels."""
    from cellseg_tpu.pipeline.flow_labels import masks_to_flows

    lbl = np.zeros((40, 40), np.int32)
    lbl[0:12, 10:26] = 1  # touches row 0
    flow, mask = masks_to_flows(lbl)
    gy_row0 = flow[0][0, 12:24]
    # row-0 pixels must point DOWN toward the cell center (gy > 0)
    assert (gy_row0 > 0.1).all(), gy_row0


def test_gaussian_smooth_sigma_x_is_first_axis():
    """MONAI convention: sigma_x blurs the FIRST spatial dimension."""
    import jax
    import jax.numpy as jnp

    from cellseg_tpu.pipeline.augment import random_gaussian_smooth

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((64, 64, 1)).astype(np.float32))
    out = random_gaussian_smooth(
        jax.random.PRNGKey(0), img, prob=1.0,
        sigma_x_range=(8.0, 8.0), sigma_y_range=(1e-3, 1e-3))
    out = np.asarray(out)[..., 0]
    # huge sigma_x → rows (axis 0) heavily smoothed, columns nearly not:
    # variance along axis 0 collapses much more than along axis 1
    var_along0 = np.var(np.diff(out, axis=0))
    var_along1 = np.var(np.diff(out, axis=1))
    assert var_along0 < 0.1 * var_along1, (var_along0, var_along1)
