"""3D distance decode: watershed, z-fusing, local/oversize splitting
(reference postprocessing.py 3D branches, :100-183)."""

import numpy as np


def _two_balls(shape=(12, 48, 48), c1=(6, 14, 14), c2=(6, 34, 34), r=8):
    zz, yy, xx = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]]
    cell = np.zeros(shape, np.float32)
    lbl = np.zeros(shape, np.int32)
    for i, (cz, cy, cx) in enumerate((c1, c2), start=1):
        d = np.sqrt(((zz - cz) * 2.0) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2)
        inside = d <= r
        cell = np.maximum(cell, np.where(inside, 1.0 - d / (r + 1), 0.0))
        lbl[inside] = i
    return cell.astype(np.float32), lbl


def test_decode_3d_two_cells():
    from cellseg_tpu.decode.distance3d import decode_distance_3d

    cell, lbl = _two_balls()
    border = np.zeros_like(cell)
    out = decode_distance_3d(border, cell)
    ids = set(np.unique(out)) - {0}
    assert len(ids) == 2
    assert out[6, 14, 14] != 0 and out[6, 34, 34] != 0
    assert out[6, 14, 14] != out[6, 34, 34]
    # voxel agreement with the generating spheres
    for c in ((6, 14, 14), (6, 34, 34)):
        region = lbl == lbl[c]
        vals, counts = np.unique(out[region], return_counts=True)
        assert counts.max() / region.sum() > 0.9


def test_decode_3d_seed_rescue():
    from cellseg_tpu.decode.distance3d import decode_distance_3d

    # weak prediction below th_seed but above th_cell
    cell, _ = _two_balls()
    out = decode_distance_3d(np.zeros_like(cell), cell * 0.35)
    assert out.max() >= 1


def test_fuse_z_seeds_merges_stacked_seeds():
    """Seeds split along z (alternating slices) fuse into one cell with
    fuse_z_seeds=True (reference :137-141)."""
    from cellseg_tpu.decode.distance3d import decode_distance_3d

    shape = (7, 32, 32)
    cell = np.zeros(shape, np.float32)
    # one column-shaped cell whose seed region is broken on odd slices
    for z in range(shape[0]):
        # odd slices low enough to stay below th_seed 0.45 even after the
        # sigma_z=0.5 smoothing mixes in the bright neighbors
        peak = 1.0 if z % 2 == 0 else 0.20
        yy, xx = np.mgrid[0:32, 0:32]
        d = np.sqrt((yy - 16) ** 2 + (xx - 16) ** 2)
        cell[z] = np.where(d <= 8, peak * (1.0 - d / 10), 0.0)
    border = np.zeros_like(cell)
    split = decode_distance_3d(border, cell, fuse_z_seeds=False)
    fused = decode_distance_3d(border, cell, fuse_z_seeds=True)
    assert len(set(np.unique(fused)) - {0}) == 1
    assert len(set(np.unique(split)) - {0}) > 1


def test_local_splitting_on_many_cells():
    """When >= n_splitting seeds appear, re-seeding from local maxima
    engages (and the oversize pass doesn't crash)."""
    from cellseg_tpu.decode.distance3d import decode_distance_3d

    shape = (4, 64, 64)
    zz, yy, xx = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]]
    cell = np.zeros(shape, np.float32)
    centers = [(2, y, x) for y in (10, 30, 50) for x in (10, 30, 50)]
    for cz, cy, cx in centers:
        d = np.sqrt(((zz - cz) * 3.0) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2)
        cell = np.maximum(cell, np.where(d <= 7, 1.0 - d / 8.0, 0.0))
    out = decode_distance_3d(np.zeros_like(cell), cell, n_splitting=5)
    ids = set(np.unique(out)) - {0}
    assert len(ids) >= 9  # all nine cells found via peak seeds


def test_split_oversized_3d():
    from cellseg_tpu.decode.distance3d import split_oversized_3d

    # two touching blobs labeled as ONE cell + one normal cell elsewhere
    shape = (6, 48, 48)
    zz, yy, xx = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]]
    cell = np.zeros(shape, np.float32)
    lbl = np.zeros(shape, np.int64)
    for cy, cx in ((14, 14), (14, 30)):  # merged pair
        d = np.sqrt(((zz - 3) * 2.0) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2)
        cell = np.maximum(cell, np.where(d <= 9, 1.0 - d / 10.0, 0.0))
        lbl[d <= 9] = 1
    d = np.sqrt(((zz - 3) * 2.0) ** 2 + (yy - 38) ** 2 + (xx - 38) ** 2)
    cell = np.maximum(cell, np.where(d <= 5, 1.0 - d / 6.0, 0.0))
    lbl[d <= 5] = 2

    out = split_oversized_3d(lbl, cell)
    # the oversized merged cell was split into two fresh ids
    merged_ids = set(np.unique(out[lbl == 1])) - {0}
    assert len(merged_ids) == 2
    assert len(set(np.unique(out)) - {0}) == 3


def test_watershed3d_plateau_keeps_both_seeds():
    """Flat-plateau tie: both markers must survive and split the plateau
    by arrival order (path length), not be absorbed into the smaller id —
    the 2D device watershed's first-arrival semantics (ops/watershed.py)."""
    from cellseg_tpu.decode.distance3d import watershed3d_host

    z, h, w = 3, 9, 21
    image = np.zeros((z, h, w), np.float32)  # one flat plateau
    mask = np.ones((z, h, w), bool)
    markers = np.zeros((z, h, w), np.int64)
    markers[1, 4, 3] = 1
    markers[1, 4, 17] = 2

    out = watershed3d_host(image, markers, mask)
    # both instances present, seeds keep their ids
    assert out[1, 4, 3] == 1 and out[1, 4, 17] == 2
    # plateau splits geodesically: near each seed its own label wins
    assert out[1, 4, 5] == 1 and out[1, 4, 15] == 2
    # the midline (equidistant) goes to the smaller id only there
    assert set(np.unique(out)) == {1, 2}
