"""Omnipose-representation analog: distance-field flow targets, the
4-channel FlowNet head, the omni loss, and the train→predict roundtrip
(VERDICT r4 item 10; reference capability
cellpose-omnipose-KIT-GE/test_omnipose_cyto2_grey.py:23-28)."""

import numpy as np
import pytest
from scipy import ndimage as ndi

from cellseg_tpu.pipeline.flow_labels import (masks_to_flows,
                                              masks_to_flows_omni)


def two_cell_label(h=64, w=64):
    """Two touching elliptical cells."""
    yy, xx = np.mgrid[:h, :w]
    lbl = np.zeros((h, w), np.int32)
    lbl[((yy - 32) / 14) ** 2 + ((xx - 18) / 14) ** 2 <= 1.0] = 1
    m2 = ((yy - 32) / 14) ** 2 + ((xx - 44) / 14) ** 2 <= 1.0
    lbl[m2 & (lbl == 0)] = 2
    assert np.any(lbl == 1) and np.any(lbl == 2)
    return lbl


def test_omni_targets_shapes_and_ranges():
    lbl = two_cell_label()
    flow, dist, boundary = masks_to_flows_omni(lbl)
    assert flow.shape == (2, 64, 64)
    assert dist.shape == (64, 64) and boundary.shape == (64, 64)
    mask = lbl > 0
    # unit flows inside (zero only at skeleton sinks where ∇φ = 0),
    # zero outside
    norm = np.sqrt(flow[0] ** 2 + flow[1] ** 2)
    inside = norm[mask]
    assert np.all((np.abs(inside - 1.0) < 1e-4) | (inside < 0.5))
    assert (np.abs(inside - 1.0) < 1e-4).mean() > 0.95
    assert np.all(norm[~mask] == 0.0)
    # dist: raw per-cell EDT inside, -1 on background
    assert np.all(dist[~mask] == -1.0)
    assert np.all(dist[mask] >= 1.0)
    # boundary shell is inside the mask and touches the mask edge
    assert np.all(mask[boundary])
    eroded = ndi.binary_erosion(mask, iterations=2)
    assert not np.any(boundary & eroded & (dist > 2.0))


def test_omni_dist_is_per_cell_edt():
    """Touching neighbors count as boundary: dist at the contact line is
    small on BOTH sides even though neither touches background there."""
    lbl = two_cell_label()
    flow, dist, _ = masks_to_flows_omni(lbl)
    contact_x = 31  # between the two cells
    col = dist[:, contact_x]
    inside = col[lbl[:, contact_x] > 0]
    assert inside.size and np.all(inside <= 2.5)
    # per-cell EDT equals scipy EDT of each cell against its complement
    for lab in (1, 2):
        cell = lbl == lab
        golden = ndi.distance_transform_edt(cell)
        assert np.allclose(dist[cell], golden[cell])


def test_omni_flows_point_inward():
    """Near the cell edge, the flow must have positive dot product with
    the inward EDT gradient (flows converge to the skeleton)."""
    lbl = two_cell_label()
    flow, dist, boundary = masks_to_flows_omni(lbl)
    gy, gx = np.gradient(ndi.distance_transform_edt(lbl > 0))
    shell = (lbl > 0) & (dist <= 3.0) & (np.hypot(gy, gx) > 0.3)
    dots = flow[0][shell] * gy[shell] + flow[1][shell] * gx[shell]
    assert (dots > 0).mean() > 0.9


def test_omni_decode_roundtrip_from_targets():
    """GT omni flows + GT dist mask through the standard tracker recover
    the instances (same style as the plain-flow decode parity test)."""
    import jax.numpy as jnp

    from cellseg_tpu.decode.flow import decode_flow
    from cellseg_tpu.metrics.f1 import eval_tp_fp_fn

    lbl = two_cell_label()
    flow, dist, _ = masks_to_flows_omni(lbl)
    out = np.asarray(decode_flow(
        jnp.asarray(np.moveaxis(flow, 0, -1)), jnp.asarray(dist),
        0.0, 60, method="propagate"))
    tp, fp, fn = eval_tp_fp_fn(lbl, out, threshold=0.5)
    assert tp == 2 and fp == 0 and fn == 0


def test_flownet_omni_head_shapes():
    import jax
    import jax.numpy as jnp

    from cellseg_tpu.models import build_model

    model = build_model("flownet", channels=(8, 16), omni=True)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    flow, aux = model.apply(params, x)
    assert flow.shape == (1, 32, 32, 2)
    assert aux.shape == (1, 32, 32, 2)


def test_omni_loss_gradients_flow():
    import jax
    import jax.numpy as jnp

    from cellseg_tpu.train.losses import omni_flow_loss

    key = jax.random.PRNGKey(0)
    flow_gt = jax.random.normal(key, (2, 16, 16, 2))
    dist_gt = jax.random.uniform(key, (2, 16, 16))
    boundary = jax.random.uniform(key, (2, 16, 16)) > 0.5
    loss = omni_flow_loss(jnp.zeros((2, 16, 16, 2)),
                          jnp.zeros((2, 16, 16, 2)),
                          flow_gt, dist_gt, boundary)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # perfect predictions: only the BCE floor remains
    perfect = omni_flow_loss(
        5.0 * flow_gt,
        jnp.stack([dist_gt,
                   jnp.where(boundary, 50.0, -50.0)], axis=-1),
        flow_gt, dist_gt, boundary)
    assert float(perfect) < 1e-3


@pytest.mark.slow
def test_omni_train_predict_roundtrip(tmp_path):
    """train_flow --omni smoke → FlowPredictor with the omni head recovers
    instances on the training image (tiny budget; representation test,
    not a quality bar)."""
    from cellseg_tpu.infer.flow_infer import FlowPredictor
    from cellseg_tpu.io import imwrite, imwrite_instance_tiff
    from cellseg_tpu.train.checkpoint import load_model_for_inference
    from cellseg_tpu.train.flow_loop import FlowTrainConfig, train_flow

    rng = np.random.RandomState(0)
    lbl = two_cell_label(96, 96)
    img = (80 + 120 * (lbl > 0) + rng.randint(0, 20, (96, 96))).astype(
        np.uint8)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for k in range(2):
        imwrite(str(tmp_path / "images" / f"c{k}.png"),
                np.repeat(img[..., None], 3, axis=-1))
        imwrite_instance_tiff(
            str(tmp_path / "labels" / f"c{k}_label.tiff"), lbl)

    cfg = FlowTrainConfig(
        data_path=str(tmp_path), work_dir=str(tmp_path / "wd"),
        input_size=96, batch_size=2, max_epochs=30,
        learning_rate=1e-3, omni=True, channels=(8, 16))
    res = train_flow(cfg)
    assert "omni" in res["model_path"]

    model, params, sidecar = load_model_for_inference(
        res["model_path"], "best_model.ckpt")
    assert sidecar["architecture"]["omni"] is True
    pred = FlowPredictor(lambda p, x: model.apply(p, x), params,
                         omni_head=True)
    assert pred.method == "propagate"
    labels = pred._forward_decode(img.astype(np.float32) / 255.0)
    assert labels.max() >= 1  # found at least one cell


def test_omni_decode_rods_with_distance_cores():
    """Elongated capsules: the point-attractor core rule fragments along
    the skeleton, the distance-ridge cores (dist > 2) recover each rod as
    ONE instance (the omnipose regime; decode_flow `cores`)."""
    import jax.numpy as jnp

    from cellseg_tpu.decode.flow import decode_flow
    from cellseg_tpu.metrics.f1 import eval_tp_fp_fn

    yy, xx = np.mgrid[:64, :96].astype(np.float64)
    lbl = np.zeros((64, 96), np.int32)
    # two horizontal rods stacked with a 1-px contact
    for i, cy in enumerate((24, 36)):
        m = (np.abs(yy - cy) <= 6) & (np.abs(xx - 48) <= 34)
        lbl[m & (lbl == 0)] = i + 1
    flow, dist, _ = masks_to_flows_omni(lbl)
    out = np.asarray(decode_flow(
        jnp.asarray(np.moveaxis(flow, 0, -1)), jnp.asarray(dist),
        0.0, 80, method="propagate",
        cores=jnp.asarray(dist > 2.0)))
    tp, fp, fn = eval_tp_fp_fn(lbl, out, threshold=0.5)
    assert (tp, fp, fn) == (2, 0, 0)


def test_omni_boundary_cut_splits_blurry_contact():
    """Regressed (blurry) distance fields bridge end-to-end rod contacts:
    dist-only cores merge the pair into one instance; cutting cores at the
    boundary channel recovers both (the FlowPredictor omni-head rule —
    merges 7→1 per ~60-rod image measured on trained predictions)."""
    import jax.numpy as jnp

    from cellseg_tpu.decode.flow import decode_flow
    from cellseg_tpu.metrics.f1 import eval_tp_fp_fn

    yy, xx = np.mgrid[:64, :128].astype(np.float64)
    lbl = np.zeros((64, 128), np.int32)
    lbl[(np.abs(yy - 32) <= 6) & (xx >= 8) & (xx <= 62)] = 1
    lbl[(np.abs(yy - 32) <= 6) & (xx >= 63) & (xx <= 118) & (lbl == 0)] = 2
    flow, dist, boundary = masks_to_flows_omni(lbl)
    # blurry-prediction analog: smoothing lifts the contact dip above the
    # core threshold (measured 2.1 at sigma 2 vs the GT's <=1.5 dip)
    dist_blur = ndi.gaussian_filter(dist, 2.0)
    co_merge = dist_blur > 2.0
    assert ndi.label(co_merge, structure=np.ones((3, 3)))[1] == 1
    decode = lambda cores: eval_tp_fp_fn(lbl, np.asarray(decode_flow(
        jnp.asarray(np.moveaxis(flow, 0, -1)), jnp.asarray(dist),
        0.0, 80, method="propagate", cores=jnp.asarray(cores))),
        threshold=0.5)
    assert decode(co_merge) == (1, 0, 1)        # merged pair
    assert decode(co_merge & ~boundary) == (2, 0, 0)  # boundary cut
