"""Edge cases across the pipeline: empty predictions, degenerate inputs."""

import numpy as np
import pytest


def test_decode_empty_prob():
    import jax.numpy as jnp

    from cellseg_tpu.decode import decode_interior_prob

    labels = np.asarray(decode_interior_prob(jnp.zeros((64, 64), jnp.float32)))
    assert labels.max() == 0


def test_score_empty_prediction():
    from cellseg_tpu.metrics import score_pair

    gt = np.zeros((32, 32), np.int32)
    gt[5:15, 5:15] = 1
    s = score_pair(gt, np.zeros_like(gt))
    assert s["f1"] == 0.0 and s["tp"] == 0


def test_score_both_empty():
    from cellseg_tpu.metrics import score_pair

    s = score_pair(np.zeros((16, 16), np.int32), np.zeros((16, 16), np.int32))
    assert s["dice"] == 1.0 and s["f1"] == 0.0


def test_normalize_all_zero_channel():
    from cellseg_tpu.pipeline import normalize_image

    img = np.zeros((16, 16, 3), np.uint8)
    img[..., 0] = 100  # only channel 0 has signal (constant → passthrough)
    out = normalize_image(img)
    assert (out[..., 1] == 0).all() and (out[..., 2] == 0).all()


def test_normalize_uint16_input():
    import jax.numpy as jnp

    from cellseg_tpu.pipeline import normalize_image, normalize_image_jax

    rng = np.random.default_rng(0)
    img = rng.integers(0, 40000, (64, 64, 3)).astype(np.uint16)
    host = normalize_image(img)
    dev = np.asarray(normalize_image_jax(jnp.asarray(img)))
    diff = np.abs(host.astype(int) - dev.astype(int))
    assert diff.max() <= 1


def test_predictor_tiny_image():
    """Images smaller than the ROI must pad + predict correctly."""
    import jax

    from cellseg_tpu.infer.predictor import Predictor
    from cellseg_tpu.models import build_model

    import jax.numpy as jnp

    m = build_model("unet", channels=(4, 8, 16), strides=(2, 2))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pred = Predictor(lambda p, t: m.apply(p, t), params, roi=64,
                     sw_batch=2, bucket=64)
    img = np.random.default_rng(0).integers(
        0, 255, (30, 40, 3)).astype(np.uint8)
    labels = pred.predict(img)
    assert labels.shape == (30, 40)


def test_cc_empty_and_full_masks():
    import jax.numpy as jnp

    from cellseg_tpu.ops.cc import label_components

    empty = np.asarray(label_components(jnp.zeros((32, 32), jnp.bool_)))
    assert empty.max() == 0
    full = np.asarray(label_components(jnp.ones((32, 32), jnp.bool_)))
    assert full.max() == 1 and (full == 1).all()


def test_relabel_device_matches_host():
    import jax.numpy as jnp

    from cellseg_tpu.metrics import relabel_sequential
    from cellseg_tpu.ops.cc import relabel_sequential_device

    rng = np.random.default_rng(1)
    m = rng.integers(0, 50, (40, 60)).astype(np.int32) * 7  # sparse ids
    got = np.asarray(relabel_sequential_device(jnp.asarray(m)))
    want = relabel_sequential(m)
    assert np.array_equal(got, want)


def test_boundary_watershed_splits_touching_cells():
    """The beyond-parity decode splits two touching cells that plain CC
    merges (decode/threeclass.py:decode_boundary_watershed)."""
    import numpy as np

    from cellseg_tpu.decode.threeclass import (decode_boundary_watershed,
                                               decode_interior_prob)

    pi = np.zeros((64, 64), np.float32)
    pb = np.zeros((64, 64), np.float32)
    pi[10:54, 10:30] = 0.95
    pi[10:54, 30:50] = 0.95
    # the ridge: boundary prob high but interior still above 0.5 → CC
    # sees one blob; the watershed variant splits on the seed cores
    pb[10:54, 28:32] = 0.8
    pi[10:54, 28:32] = 0.6
    cc = np.asarray(decode_interior_prob(pi))
    ws = np.asarray(decode_boundary_watershed(pi, pb))
    assert cc.max() == 1  # merged
    assert ws.max() == 2  # split
    assert ws[30, 20] != ws[30, 40] and ws[30, 20] > 0 and ws[30, 40] > 0
    # on a clean single cell both decoders agree
    pi2 = np.zeros((64, 64), np.float32)
    pi2[20:44, 20:44] = 0.9
    assert np.asarray(decode_boundary_watershed(pi2, np.zeros_like(pi2))).max() == 1
