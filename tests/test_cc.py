import numpy as np
import pytest

from cellseg_tpu.decode import decode_interior_prob, decode_interior_prob_host
from cellseg_tpu.ops.cc import (
    label_components,
    remove_small_holes_jax,
    remove_small_objects_jax,
)
from cellseg_tpu.ops.host_morphology import (
    connected_components,
    remove_small_holes,
    remove_small_objects,
)


def random_mask(rng, shape=(96, 128), p=0.35):
    return rng.random(shape) < p


@pytest.mark.parametrize("connectivity", [1, 2])
def test_label_components_matches_scipy(rng, connectivity):
    import jax.numpy as jnp

    for trial in range(4):
        m = random_mask(rng, p=0.3 + 0.1 * trial)
        got = np.asarray(label_components(jnp.asarray(m), connectivity=connectivity))
        want = connected_components(m, connectivity=connectivity)
        assert np.array_equal(got, want), f"trial {trial} conn {connectivity}"


def test_label_components_snake(rng):
    """Worst-case serpentine component exercises pointer jumping."""
    import jax.numpy as jnp

    m = np.zeros((64, 64), dtype=bool)
    for r in range(0, 64, 2):
        m[r, :] = True
        if (r // 2) % 2 == 0:
            m[r + 1 if r + 1 < 64 else r, 63] = True
        else:
            m[r + 1 if r + 1 < 64 else r, 0] = True
    got = np.asarray(label_components(jnp.asarray(m), connectivity=1))
    want = connected_components(m, connectivity=1)
    assert np.array_equal(got, want)


def test_remove_small_objects_parity(rng):
    import jax.numpy as jnp

    m = random_mask(rng, p=0.25)
    got = np.asarray(remove_small_objects_jax(jnp.asarray(m), min_size=16))
    want = remove_small_objects(m, min_size=16)
    assert np.array_equal(got, want)


def test_remove_small_holes_parity(rng):
    import jax.numpy as jnp

    m = random_mask(rng, p=0.6)
    got = np.asarray(remove_small_holes_jax(jnp.asarray(m), area_threshold=64))
    want = remove_small_holes(m, area_threshold=64)
    assert np.array_equal(got, want)


def test_decode_device_matches_host(rng):
    import jax.numpy as jnp

    prob = rng.random((128, 160)).astype(np.float32)
    # smooth it so blobs form
    from scipy.ndimage import gaussian_filter

    prob = gaussian_filter(prob, 3.0)
    prob = (prob - prob.min()) / (prob.max() - prob.min())
    got = np.asarray(decode_interior_prob(jnp.asarray(prob)))
    want = decode_interior_prob_host(prob)
    assert np.array_equal(got, want)
    assert got.max() > 0


def test_label_components_fuzz(rng):
    """256² fuzz across densities, both connectivities, vs scipy."""
    import jax.numpy as jnp

    for p in (0.2, 0.45, 0.8):
        m = rng.random((256, 256)) < p
        for conn in (1, 2):
            got = np.asarray(label_components(jnp.asarray(m),
                                              connectivity=conn))
            want = connected_components(m, connectivity=conn)
            assert np.array_equal(got, want), (p, conn)


@pytest.mark.slow
def test_label_components_fuzz_large(rng):
    """512² labyrinthine fuzz (slow tier; the 256² fuzz covers the default
    tier)."""
    import jax.numpy as jnp

    for p in (0.45, 0.6):
        m = rng.random((512, 512)) < p
        for conn in (1, 2):
            got = np.asarray(label_components(jnp.asarray(m),
                                              connectivity=conn))
            want = connected_components(m, connectivity=conn)
            assert np.array_equal(got, want), (p, conn)


@pytest.mark.slow
def test_coarse_seeded_roots_match_plain():
    """Multigrid coarse seeding must reach the identical fixed point
    (component-min index) as plain init on adversarial masks.

    Slow tier: coarse seeding is an opt-in path
    (_root_labels(coarse_seed=True)) not engaged by any default decode."""
    from cellseg_tpu.ops.cc import _root_labels

    rng = np.random.RandomState(11)
    masks = []
    # random speckle at several densities (block-pure and crust regions)
    for p in (0.2, 0.5, 0.8, 0.95):
        masks.append(rng.rand(128, 128) < p)
    # spiral corridor: one long component winding through the image
    spiral = np.zeros((128, 128), bool)
    x0, x1, y0, y1 = 0, 127, 0, 127
    while x0 < x1 and y0 < y1:
        spiral[y0, x0:x1 + 1] = True
        spiral[y0:y1 + 1, x1] = True
        spiral[y1, x0:x1 + 1] = True
        spiral[y0:y1 + 1, x0] = True
        x0 += 8; x1 -= 8; y0 += 8; y1 -= 8
    masks.append(spiral)
    # two large regions joined by a 1px corridor through a partial block
    two = np.zeros((128, 128), bool)
    two[:, :56] = True
    two[:, 72:] = True
    two[64, 56:72] = True
    masks.append(two)
    for i, m in enumerate(masks):
        for conn in (1, 2):
            plain = np.asarray(_root_labels(m, connectivity=conn))
            seeded = np.asarray(_root_labels(m, connectivity=conn,
                                             coarse_seed=True))
            np.testing.assert_array_equal(plain, seeded,
                                          err_msg=f"mask {i} conn {conn}")


def test_region_roots_matches_both_domains():
    """One fused region propagation == _root_labels on the mask AND on its
    complement (roots are component-min linear indices in both)."""
    from cellseg_tpu.ops.cc import _INF_I, _root_labels, region_roots

    rng = np.random.RandomState(7)
    for p in (0.1, 0.35, 0.6, 0.9):
        mask = rng.rand(96, 128) < p
        roots = np.asarray(region_roots(mask))
        want_fg = np.asarray(_root_labels(mask, connectivity=1))
        want_bg = np.asarray(_root_labels(~mask, connectivity=1))
        np.testing.assert_array_equal(
            np.where(mask, roots, _INF_I), want_fg, err_msg=f"fg p={p}")
        np.testing.assert_array_equal(
            np.where(~mask, roots, _INF_I), want_bg, err_msg=f"bg p={p}")


def test_region_roots_uniform_mask():
    from cellseg_tpu.ops.cc import region_roots

    for val in (False, True):
        mask = np.full((32, 64), val)
        roots = np.asarray(region_roots(mask))
        np.testing.assert_array_equal(roots, np.zeros((32, 64), np.int32))
