import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cellseg_tpu.ops.watershed import watershed_jax
from cellseg_tpu.parallel.spatial import AXIS
from cellseg_tpu.parallel.spatial_watershed import (
    spatial_decode_distance,
    spatial_watershed,
)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:4]), (AXIS,))


def test_spatial_watershed_matches_single(mesh):
    h, w = 256, 128  # 4 stripes of 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    # two basins, one straddling the stripe boundary at row 64
    b1 = np.exp(-(((yy - 60) ** 2 + (xx - 40) ** 2) / 400))
    b2 = np.exp(-(((yy - 180) ** 2 + (xx - 90) ** 2) / 500))
    cell = np.maximum(b1, b2)
    mask = cell > 0.1
    markers = np.zeros((h, w), np.int32)
    markers[60, 40] = 1
    markers[180, 90] = 2

    sh = NamedSharding(mesh, P(AXIS, None))
    got = np.asarray(spatial_watershed(
        jax.device_put(jnp.asarray(-cell), sh),
        jax.device_put(jnp.asarray(markers), sh),
        jax.device_put(jnp.asarray(mask), sh),
        mesh,
    ))
    want = np.asarray(watershed_jax(jnp.asarray(-cell), jnp.asarray(markers),
                                    jnp.asarray(mask)))
    assert np.array_equal(got, want)
    assert set(np.unique(got[mask])) == {1, 2}


@pytest.mark.slow
def test_spatial_decode_distance_matches_single(mesh):
    from cellseg_tpu.decode.distance import decode_distance
    from cellseg_tpu.metrics import relabel_sequential, score_pair
    from cellseg_tpu.pipeline.distance_labels import distance_label_2d

    h, w = 256, 128
    lbl = np.zeros((h, w), np.int32)
    lbl[20:58, 20:60] = 1     # straddles nothing
    lbl[50:100, 70:110] = 2   # straddles the row-64 boundary
    lbl[150:200, 30:80] = 3
    cell_d, neigh_d = distance_label_2d(lbl, cell_radius=40,
                                        neighbor_radius=60)

    sh = NamedSharding(mesh, P(AXIS, None))
    got = spatial_decode_distance(
        jax.device_put(jnp.asarray(neigh_d), sh),
        jax.device_put(jnp.asarray(cell_d), sh),
        mesh,
    )
    want = relabel_sequential(decode_distance(neigh_d, cell_d))
    s = score_pair(want, got, count_bd_cells=True)
    assert s["f1"] == 1.0, s
    # pixel-level agreement must be near-exact (plateau ties only)
    agree = (got == want).mean()
    assert agree > 0.999, agree


def test_spatial_watershed_quantized_fuzz(mesh):
    """Plateau-heavy quantized terrain with many cross-stripe basins:
    exercises the convergence check's cost plane (a cost-only relaxation
    in one sweep can flip a label only in the NEXT sweep — exiting early
    breaks bit-parity with the single-device flood)."""
    rng = np.random.default_rng(42)
    h, w = 256, 96
    # coarse smooth field quantized to 4 levels → large flat plateaus
    base = rng.random((8, 3))
    field = np.kron(base, np.ones((32, 32)))
    cell = np.round(field * 4.0) / 4.0
    mask = np.ones((h, w), bool)
    markers = np.zeros((h, w), np.int32)
    pts = rng.choice(h * w, size=24, replace=False)
    for i, p in enumerate(pts, start=1):
        markers[p // w, p % w] = i

    sh = NamedSharding(mesh, P(AXIS, None))
    got = np.asarray(spatial_watershed(
        jax.device_put(jnp.asarray(-cell), sh),
        jax.device_put(jnp.asarray(markers), sh),
        jax.device_put(jnp.asarray(mask), sh),
        mesh,
    ))
    want = np.asarray(watershed_jax(jnp.asarray(-cell), jnp.asarray(markers),
                                    jnp.asarray(mask)))
    assert np.array_equal(got, want)
    assert set(np.unique(got)) == set(range(1, 25))


@pytest.fixture(scope="module")
def mesh2d():
    from cellseg_tpu.parallel.spatial2d import make_mesh2d

    return make_mesh2d(2, 4)


@pytest.mark.slow
def test_spatial_watershed_2d_matches_single(mesh2d):
    """2-D block-sharded minimax flood is bit-equal to the single-device
    watershed (basins straddling BOTH the row and the column seams)."""
    from jax.sharding import PartitionSpec
    from cellseg_tpu.parallel.spatial2d import AXX, AXY
    from cellseg_tpu.parallel.spatial_watershed import spatial_watershed_2d

    h, w = 128, 256  # (2, 4) blocks of 64x64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    b1 = np.exp(-(((yy - 60) ** 2 + (xx - 60) ** 2) / 500))   # row+col seam
    b2 = np.exp(-(((yy - 64) ** 2 + (xx - 190) ** 2) / 700))  # row seam
    cell = np.maximum(b1, b2)
    mask = cell > 0.1
    markers = np.zeros((h, w), np.int32)
    markers[60, 60] = 1
    markers[64, 190] = 2

    sh = NamedSharding(mesh2d, PartitionSpec(AXY, AXX))
    got = np.asarray(spatial_watershed_2d(
        jax.device_put(jnp.asarray(-cell), sh),
        jax.device_put(jnp.asarray(markers), sh),
        jax.device_put(jnp.asarray(mask), sh),
        mesh2d,
    ))
    want = np.asarray(watershed_jax(jnp.asarray(-cell), jnp.asarray(markers),
                                    jnp.asarray(mask)))
    assert np.array_equal(got, want)
    assert set(np.unique(got[mask])) == {1, 2}


@pytest.mark.slow
def test_spatial_decode_distance_2d_matches_single(mesh2d):
    from jax.sharding import PartitionSpec
    from cellseg_tpu.decode.distance import decode_distance
    from cellseg_tpu.metrics import relabel_sequential, score_pair
    from cellseg_tpu.parallel.spatial2d import AXX, AXY
    from cellseg_tpu.parallel.spatial_watershed import (
        spatial_decode_distance_2d,
    )
    from cellseg_tpu.pipeline.distance_labels import distance_label_2d

    h, w = 128, 256
    lbl = np.zeros((h, w), np.int32)
    lbl[20:58, 20:60] = 1
    lbl[50:100, 100:140] = 2   # straddles the row seam at 64
    lbl[30:80, 150:210] = 3    # straddles a column seam at 192
    cell_d, neigh_d = distance_label_2d(lbl, cell_radius=40,
                                        neighbor_radius=60)

    sh = NamedSharding(mesh2d, PartitionSpec(AXY, AXX))
    got = spatial_decode_distance_2d(
        jax.device_put(jnp.asarray(neigh_d), sh),
        jax.device_put(jnp.asarray(cell_d), sh),
        mesh2d,
    )
    want = relabel_sequential(decode_distance(neigh_d, cell_d))
    s = score_pair(want, got, count_bd_cells=True)
    assert s["f1"] == 1.0, s
    agree = (got == want).mean()
    assert agree > 0.999, agree


def test_spatial_watershed_giant_marker_ids(mesh):
    """Marker ids above 2^24 (global raster root indices on gigapixel
    canvases) must cross the stripe-boundary halo exchange intact — a
    float32 detour would alias 16777217/16777219 to the same value."""
    h, w = 256, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    # two adjacent basins straddling the stripe boundary at row 64
    b1 = np.exp(-(((yy - 50) ** 2 + (xx - 64) ** 2) / 900))
    b2 = np.exp(-(((yy - 80) ** 2 + (xx - 64) ** 2) / 900))
    cell = np.maximum(b1, b2)
    mask = cell > 0.05
    id1, id2 = 2**24 + 1, 2**24 + 3  # both round to 16777216/8 in float32
    markers = np.zeros((h, w), np.int32)
    markers[50, 64] = id1
    markers[80, 64] = id2

    sh = NamedSharding(mesh, P(AXIS, None))
    got = np.asarray(spatial_watershed(
        jax.device_put(jnp.asarray(-cell), sh),
        jax.device_put(jnp.asarray(markers), sh),
        jax.device_put(jnp.asarray(mask), sh),
        mesh,
    ))
    assert set(np.unique(got[mask])) == {id1, id2}
    want = np.asarray(watershed_jax(jnp.asarray(-cell), jnp.asarray(markers),
                                    jnp.asarray(mask)))
    assert np.array_equal(got, want)


@pytest.mark.slow
def test_seed_filter_whole_component_when_threshold_exceeds_stripe(mesh):
    """threshold > stripe regime: the root block's decision floods each
    seed component, so every seed is kept or dropped WHOLE — a
    seam-crossing seed must never survive as a partial sliver."""
    from cellseg_tpu.parallel.spatial_watershed import spatial_decode_distance

    h, w = 256, 192  # 4 stripes of 64
    # one giant seam-crossing cell (drives mean seed area, and thus the
    # threshold, far past the 64-row stripe) + one mid-size seam-crosser
    cell = np.zeros((h, w), np.float64)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    big = np.maximum(0, 1 - np.maximum(np.abs(yy - 128) / 120,
                                       np.abs(xx - 60) / 55))
    mid = np.maximum(0, 1 - np.maximum(np.abs(yy - 64) / 26,
                                       np.abs(xx - 150) / 26))
    cell = np.maximum(big, mid)
    border = np.zeros((h, w), np.float64)

    sh = NamedSharding(mesh, P(AXIS, None))
    got = spatial_decode_distance(
        jax.device_put(jnp.asarray(border), sh),
        jax.device_put(jnp.asarray(cell), sh),
        mesh,
    )
    # whole-component property: every output instance is 8-connected
    # (a sliver split off its body would create a second piece with the
    # same decision history → disconnected label)
    from scipy import ndimage as ndi

    for lab_id in np.unique(got[got > 0]):
        _, n_pieces = ndi.label(got == lab_id,
                                structure=np.ones((3, 3), np.int32))
        assert n_pieces == 1, (lab_id, n_pieces)
    assert got.max() >= 1


def test_sharded_forward_rejects_large_overlap(mesh):
    """overlap > 0.5 would re-introduce ghost-overhanging edge tiles
    (single flush origin per stripe); the engine must refuse."""
    from cellseg_tpu.parallel.spatial import spatial_sliding_window

    img = jnp.zeros((256, 128, 3), jnp.float32)
    with pytest.raises(ValueError, match="overlap"):
        spatial_sliding_window(lambda p, t: t, None, img, mesh,
                               roi=64, overlap=0.75)
