"""FlowPredictor: tiled inference, diameter auto-rescale, omni decode."""

import numpy as np
import pytest


def _synthetic_flow_field(size, centers_radii):
    """Build (flow, cellprob, labels) pointing at each cell center."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    flow = np.zeros((size, size, 2), np.float32)
    prob = np.full((size, size), -5.0, np.float32)
    lbl = np.zeros((size, size), np.int32)
    for i, (cy, cx, r) in enumerate(centers_radii, start=1):
        inside = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        dy, dx = cy - yy, cx - xx
        n = np.sqrt(dy ** 2 + dx ** 2) + 1e-6
        flow[..., 0] = np.where(inside, dy / n, flow[..., 0])
        flow[..., 1] = np.where(inside, dx / n, flow[..., 1])
        prob[inside] = 5.0
        lbl[inside] = i
    return flow, prob, lbl


class _FakeFlowModel:
    """apply(params, x) → flow field derived from the hidden GT geometry
    embedded per tile position is impossible — instead the fake model
    reconstructs flows from the IMAGE: bright disks on dark background,
    flows point to the local center-of-mass direction via a blur trick."""

    def __init__(self, centers_radii, size):
        self.flow, self.prob, _ = _synthetic_flow_field(size, centers_radii)

    def __call__(self, params, x):
        # x: (B, h, w, 1) tiles — not position-aware; only valid for
        # whole-image calls in these tests
        import jax.numpy as jnp

        b, h, w, _ = x.shape
        flow = jnp.asarray(self.flow[None, :h, :w])
        prob = jnp.asarray(self.prob[None, :h, :w, None])
        flow = jnp.broadcast_to(flow, (b, h, w, 2))
        prob = jnp.broadcast_to(prob, (b, h, w, 1))
        return flow, prob


def test_decode_flow_omni_matches_instances():
    import jax.numpy as jnp

    from cellseg_tpu.decode.flow import decode_flow

    flow, prob, lbl = _synthetic_flow_field(
        96, [(30, 30, 12), (70, 70, 12)])
    out = np.asarray(decode_flow(jnp.asarray(flow), jnp.asarray(prob),
                                 0.0, 50, method="omni"))
    ids = set(np.unique(out)) - {0}
    assert len(ids) == 2
    # pixel agreement with GT instances (up to id permutation)
    for cy, cx in ((30, 30), (70, 70)):
        region = lbl == lbl[cy, cx]
        vals, counts = np.unique(out[region], return_counts=True)
        assert counts.max() / region.sum() > 0.95


def test_decode_flow_propagate_matches_doubling():
    """The gather-free bounded-window tracker must recover the same
    instance partition as pointer doubling (up to id permutation)."""
    import jax.numpy as jnp

    from cellseg_tpu.decode.flow import decode_flow

    flow, prob, lbl = _synthetic_flow_field(
        128, [(30, 30, 12), (80, 84, 16), (100, 30, 10)])
    outs = {}
    for m in ("propagate", "doubling"):
        outs[m] = np.asarray(decode_flow(jnp.asarray(flow),
                                         jnp.asarray(prob), 0.0, 100,
                                         method=m))
    for m, out in outs.items():
        ids = set(np.unique(out)) - {0}
        assert len(ids) == 3, (m, ids)
        for i in (1, 2, 3):
            region = lbl == i
            _, counts = np.unique(out[region], return_counts=True)
            assert counts.max() / region.sum() > 0.95, (m, i)
    # the two methods agree pixelwise up to a label permutation
    a, b = outs["propagate"], outs["doubling"]
    both = (a > 0) & (b > 0)
    agree = np.mean(a[both] == b[both]) if both.any() else 1.0
    assert agree > 0.95


def test_flow_predictor_method_knob():
    from cellseg_tpu.infer.flow_infer import FlowPredictor

    pred = FlowPredictor(lambda p, x: None, None)
    assert pred.method == "propagate"
    assert FlowPredictor(lambda p, x: None, None, omni=True).method == "omni"
    assert FlowPredictor(lambda p, x: None, None,
                         method="doubling").method == "doubling"


def test_estimate_diameter():
    from cellseg_tpu.infer.flow_infer import estimate_diameter

    lbl = np.zeros((64, 64), np.int32)
    yy, xx = np.mgrid[0:64, 0:64]
    lbl[(yy - 20) ** 2 + (xx - 20) ** 2 <= 100] = 1  # r=10 → d=20
    lbl[(yy - 50) ** 2 + (xx - 50) ** 2 <= 100] = 2
    d = estimate_diameter(lbl)
    assert 18 <= d <= 22
    assert estimate_diameter(np.zeros((8, 8), np.int32)) == 0.0


def test_flow_predictor_whole_vs_tiled_consistency():
    """A 160² field decoded whole-image vs through the tiled path (roi 64)
    must produce the same instances."""
    from cellseg_tpu.infer.flow_infer import FlowPredictor

    centers = [(40, 40, 14), (120, 120, 14), (40, 120, 14)]
    model = _FakeFlowModel(centers, 160)
    img = np.zeros((160, 160), np.float32)
    _, prob, lbl = _synthetic_flow_field(160, centers)
    img[prob > 0] = 1.0

    whole = FlowPredictor(model, {}, tile_threshold=10_000)
    labels_whole = whole._forward_decode(img)
    n_whole = len(set(np.unique(labels_whole)) - {0})
    assert n_whole == 3

    # NOTE: the fake model is not position-aware, so true tiled parity
    # can't be tested with it; instead check the tiled plumbing runs and
    # produces a labeling of the right shape on a position-independent
    # field (single centered cell spanning the whole image).
    one = _FakeFlowModel([(80, 80, 70)], 160)
    img1 = np.zeros((160, 160), np.float32)
    tiled = FlowPredictor(one, {}, tile_threshold=100, roi=160, sw_batch=1)
    labels_tiled = tiled._forward_decode(img1)
    assert labels_tiled.shape == (160, 160)
    assert labels_tiled.max() >= 1


class _ImageDrivenFlowModel:
    """Scale-aware fake: flows follow the gradient of the blurred image,
    cellprob is +/-5 on the brightness threshold — valid at any zoom."""

    def __call__(self, params, x):
        import jax.numpy as jnp

        from cellseg_tpu.pipeline.augment import separable_gaussian_blur

        img = x[..., 0]  # (B, h, w)
        blurred = jnp.stack([
            separable_gaussian_blur(img[b][..., None],
                                    jnp.float32(6.0), jnp.float32(6.0),
                                    radius=12)[..., 0]
            for b in range(img.shape[0])
        ])
        dy = jnp.gradient(blurred, axis=1)
        dx = jnp.gradient(blurred, axis=2)
        n = jnp.sqrt(dy ** 2 + dx ** 2) + 1e-6
        flow = jnp.stack([dy / n, dx / n], axis=-1)
        prob = jnp.where(img > 0.5, 5.0, -5.0)[..., None]
        return flow, prob


def test_flow_predictor_diameter_rescale():
    """diameter=<px> rescales toward diam_mean before decoding; the output
    grid must match the input image."""
    from cellseg_tpu.infer.flow_infer import FlowPredictor

    yy, xx = np.mgrid[0:120, 0:120]
    img = ((yy - 60) ** 2 + (xx - 60) ** 2 <= 40 * 40).astype(np.float32)

    pred = FlowPredictor(_ImageDrivenFlowModel(), {}, diam_mean=30.0,
                         tile_threshold=10_000)
    # scale factor 30/80 = 0.375 → model sees a ~45² image
    labels = pred.predict(img, diameter=80.0)
    assert labels.shape == (120, 120)
    assert labels.max() >= 1
    # the upscaled mask must still cover the cell center
    assert labels[60, 60] != 0


def test_flow_predictor_auto_diameter_near_nominal_single_pass():
    """Auto mode with cells near nominal size must not rescale (factor in
    [0.8, 1.2] → single pass)."""
    from cellseg_tpu.infer import flow_infer
    from cellseg_tpu.infer.flow_infer import FlowPredictor

    centers = [(30, 30, 14), (70, 70, 14)]  # diameter 28 ≈ nominal 30
    model = _FakeFlowModel(centers, 96)
    img = np.zeros((96, 96), np.float32)
    _, prob, _ = _synthetic_flow_field(96, centers)
    img[prob > 0] = 1.0

    pred = FlowPredictor(model, {}, diam_mean=30.0, tile_threshold=10_000)
    calls = []
    orig = pred._predict_scaled
    pred._predict_scaled = lambda *a, **k: calls.append(1) or orig(*a, **k)
    labels = pred.predict(img, diameter=None)
    assert len(set(np.unique(labels)) - {0}) == 2
    assert not calls  # no second pass
