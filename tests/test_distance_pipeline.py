"""Distance-regression pipeline: labels, watershed, decode."""

import numpy as np
import pytest

from cellseg_tpu.pipeline.distance_labels import (
    border_label_2d,
    distance_label_2d,
)


def two_touching_cells(h=48, w=64):
    lbl = np.zeros((h, w), dtype=np.int32)
    lbl[10:30, 10:30] = 1
    lbl[10:30, 30:50] = 2  # touches cell 1 along column 30
    return lbl


def test_border_label_touching():
    lbl = two_touching_cells()
    border = border_label_2d(lbl)
    assert (border == 2).sum() > 0
    # the touching columns must be border
    assert border[15, 29] == 2 or border[15, 30] == 2
    # far-away cell surface isn't "touching border"
    assert border[10, 10] == 1


def test_distance_labels_ranges():
    lbl = two_touching_cells()
    cell_d, neigh_d = distance_label_2d(lbl, cell_radius=25, neighbor_radius=25)
    assert cell_d.shape == lbl.shape and neigh_d.shape == lbl.shape
    assert 0.99 <= cell_d.max() <= 1.01
    assert cell_d[lbl == 0].max() == 0
    # neighbor distance peaks near the touching border
    near = neigh_d[12:28, 27:33].mean()
    far = neigh_d[12:28, 11:14].mean()
    assert near > far


def test_watershed_device_matches_host():
    import jax.numpy as jnp

    from cellseg_tpu.ops.watershed import watershed_host, watershed_jax

    rng = np.random.default_rng(3)
    h = w = 96
    # two gaussian bumps → two basins
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    bump1 = np.exp(-(((yy - 30) ** 2 + (xx - 30) ** 2) / 200))
    bump2 = np.exp(-(((yy - 60) ** 2 + (xx - 66) ** 2) / 260))
    cell = np.maximum(bump1, bump2) + rng.normal(0, 0.001, (h, w))
    mask = cell > 0.15
    markers = np.zeros((h, w), dtype=np.int32)
    markers[30, 30] = 1
    markers[60, 66] = 2

    got = np.asarray(watershed_jax(jnp.asarray(-cell), jnp.asarray(markers),
                                   jnp.asarray(mask)))
    want = watershed_host(-cell, markers, mask)
    agree = (got == want)[mask].mean()
    assert agree > 0.99, agree
    assert set(np.unique(got[mask])) == {1, 2}


def test_decode_distance_end_to_end():
    from cellseg_tpu.decode import decode_distance
    from cellseg_tpu.metrics import score_pair

    lbl = np.zeros((96, 96), dtype=np.int32)
    lbl[12:40, 12:40] = 1
    lbl[50:85, 50:85] = 2
    lbl[12:40, 55:80] = 3
    cell_d, neigh_d = distance_label_2d(lbl, cell_radius=40, neighbor_radius=40)
    # decode from the GROUND-TRUTH distance maps: must recover the instances
    pred = decode_distance(neigh_d, cell_d, th_cell=0.07, th_seed=0.45)
    s = score_pair(lbl, pred, threshold=0.5, count_bd_cells=True)
    assert s["f1"] == 1.0, s


def test_decode_distance_seed_rescue():
    from cellseg_tpu.decode import decode_distance

    # weak prediction: below the default seed threshold but above cell th
    cell = np.zeros((64, 64), dtype=np.float32)
    yy, xx = np.mgrid[0:64, 0:64]
    cell[:] = 0.35 * np.exp(-(((yy - 32) ** 2 + (xx - 32) ** 2) / 150))
    border = np.zeros_like(cell)
    pred = decode_distance(border, cell, th_cell=0.07, th_seed=0.45)
    assert pred.max() >= 1  # rescue loop found at least one cell


def test_seed_rescue_keeps_small_seeds():
    """In the decay loop the reference removes only area<=4 seeds
    (postprocessing.py:104-112), NOT the 0.1*mean_area filter — on the
    near-empty predictions the rescue exists for, the mean-area filter
    would kill small-but-real seeds next to one large seed."""
    from cellseg_tpu.decode import decode_distance

    yy, xx = np.mgrid[0:96, 0:96]
    # big broad blob, peak 0.40: ~hundreds of px above 0.35 after decay
    big = 0.40 * np.exp(-(((yy - 30) ** 2 + (xx - 30) ** 2) / 900.0))
    # small narrow blob, peak 0.39: only a handful of px above 0.35
    small = 0.39 * np.exp(-(((yy - 75) ** 2 + (xx - 75) ** 2) / 18.0))
    cell = np.maximum(big, small).astype(np.float32)
    border = np.zeros_like(cell)
    # th_seed 0.45 yields no seeds; first decay step (0.35) yields both
    pred = decode_distance(border, cell, th_cell=0.07, th_seed=0.45)
    n_seeds_above = int((cell > 0.35).sum())
    assert n_seeds_above > 0
    ids = set(np.unique(pred)) - {0}
    assert len(ids) == 2, (len(ids), "mean-area filter leaked into rescue")
    # the small instance must cover the small blob's peak
    assert pred[75, 75] != 0 and pred[30, 30] != 0
    assert pred[75, 75] != pred[30, 30]


def test_flow_roundtrip():
    import jax.numpy as jnp

    from cellseg_tpu.decode import decode_flow
    from cellseg_tpu.metrics import score_pair
    from cellseg_tpu.pipeline.flow_labels import masks_to_flows

    lbl = np.zeros((96, 96), dtype=np.int32)
    lbl[10:40, 10:44] = 1
    lbl[52:88, 40:80] = 2
    flow, mask = masks_to_flows(lbl)
    flow_hw2 = np.moveaxis(flow, 0, -1)
    cellprob = np.where(mask, 5.0, -5.0).astype(np.float32)
    pred = np.asarray(decode_flow(jnp.asarray(flow_hw2),
                                  jnp.asarray(cellprob), n_iter=100))
    s = score_pair(lbl, pred, threshold=0.5, count_bd_cells=True)
    assert s["f1"] == 1.0, s


def test_distance_predictor_tiled_routing_parity():
    """tile_threshold routes large inputs through the sliding-window
    forward; with a POINTWISE apply_fn the overlap blend averages
    identical values, so tiled and whole-image paths must agree exactly
    (pins routing + blend normalization; conv-context deltas are covered
    by the engine's MONAI-parity tests)."""
    import jax.numpy as jnp

    from cellseg_tpu.infer.distance_infer import DistancePredictor

    def apply_fn(params, t):
        return t * 2.0, t * 3.0 + 1.0

    rng = np.random.RandomState(0)
    img = rng.rand(160, 130).astype(np.float32)

    whole = DistancePredictor(apply_fn, {}, tile_threshold=0)
    tiled = DistancePredictor(apply_fn, {}, tile_threshold=64, roi=64)
    bw, cw = whole.predict_raw(img)
    bt, ct = tiled.predict_raw(img)
    assert bw.shape == bt.shape == img.shape
    np.testing.assert_allclose(bt, bw, atol=1e-5)
    np.testing.assert_allclose(ct, cw, atol=1e-5)
    # small images stay on the whole-image path (no tiled program cached)
    small = DistancePredictor(apply_fn, {}, tile_threshold=64, roi=64)
    small.predict_raw(img[:40, :40])
    assert not any(isinstance(k, tuple) and k and k[0] == "tiled"
                   for k in small._jitted)
