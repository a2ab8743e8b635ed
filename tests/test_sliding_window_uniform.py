"""Uniform-grid fast blend path: parity with the general accumulator."""

import jax.numpy as jnp
import numpy as np
import pytest

from cellseg_tpu.infer.sliding_window import (
    _run_tiled,
    _run_tiled_uniform,
    sliding_window_inference,
    tile_origins,
    tiles_to_canvas,
)


def pointwise(params, tiles):
    return tiles * 1.7 - 0.3


@pytest.mark.parametrize("mode", ["constant", "gaussian"])
def test_uniform_path_matches_general(mode):
    roi, overlap = 64, 0.25
    stride = int(roi * (1 - overlap))
    h = roi + 8 * stride   # uniform grid by construction
    w = roi + 5 * stride
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((h, w, 3)).astype(np.float32))

    ys = tile_origins(h, roi, overlap)
    xs = tile_origins(w, roi, overlap)
    assert np.array_equal(ys, np.arange(len(ys)) * stride)  # sanity

    grid = np.stack(np.meshgrid(ys, xs, indexing="ij"), -1).reshape(-1, 2)
    rem = (-len(grid)) % 4
    grid_p = np.concatenate([grid, np.repeat(grid[-1:], rem, 0)]) if rem else grid
    weights = np.concatenate(
        [np.ones(len(grid), np.float32), np.zeros(rem, np.float32)])

    fast = _run_tiled_uniform(pointwise, None, img, jnp.asarray(grid_p),
                              roi, stride, 4, 3, mode, (len(ys), len(xs)))
    general = _run_tiled(pointwise, None, img, jnp.asarray(grid_p),
                         jnp.asarray(weights), roi, 4, 3, mode)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(general),
                               atol=1e-5)


def test_tiles_to_canvas_counts():
    """Summing all-ones tiles gives the coverage-count map."""
    roi, stride = 64, 48
    ny, nx = 5, 4
    h = (ny - 1) * stride + roi
    w = (nx - 1) * stride + roi
    ones = jnp.ones((ny, nx, roi, roi, 1), jnp.float32)
    cnt = np.asarray(tiles_to_canvas(ones, stride, roi, h, w))[..., 0]
    want = np.zeros((h, w), np.float32)
    for i in range(ny):
        for j in range(nx):
            want[i * stride:i * stride + roi, j * stride:j * stride + roi] += 1
    assert np.array_equal(cnt, want)


def test_dispatcher_uses_uniform_when_possible():
    """End-to-end call on a uniform shape equals the pointwise function."""
    roi, overlap = 64, 0.25
    stride = int(roi * (1 - overlap))
    h = roi + 4 * stride
    w = roi + 4 * stride
    rng = np.random.default_rng(1)
    img = rng.random((h, w, 3)).astype(np.float32)
    out = sliding_window_inference(pointwise, None, jnp.asarray(img),
                                   roi=roi, sw_batch=4, overlap=overlap,
                                   out_channels=3)
    np.testing.assert_allclose(np.asarray(out), img * 1.7 - 0.3, atol=1e-5)
