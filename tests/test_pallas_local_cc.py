"""Parity tests for the block-local CC convergence kernel
(ops/pallas/local_cc.py) in interpret mode on the CPU test mesh.

The kernel's contract: composed to an OUTER fixed point (row-stripe
converge, full-height column scan, and for 8-conn one global 3x3 sweep),
the result equals the global propagation fixed point of ops/cc.py — the
component-min label plane. These tests drive that composition directly and
compare against _propagate / _propagate_region.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from cellseg_tpu.ops.cc import _INF, _propagate, _propagate_region, _sweep_min
from cellseg_tpu.ops.pallas.local_cc import _h_stripe, stripe_converge
from cellseg_tpu.ops.pallas.scans import col_segmented_min_scan


def _outer_fixed_point(lab, m, connectivity=1, region=False, mask=None,
                       max_outer=64):
    cur = lab
    for it in range(max_outer):
        new = stripe_converge(cur, m, connectivity=connectivity,
                              region=region, cap=4, interpret=True)
        new = col_segmented_min_scan(new, m, region=region, interpret=True)
        if connectivity == 2 and not region:
            new = _sweep_min(new, mask, 2)
        if bool(jnp.all(new == cur)):
            return cur, it
        cur = new
    raise AssertionError("outer loop did not converge")


@pytest.mark.parametrize("connectivity", [1, 2])
@pytest.mark.parametrize("density", [0.4, 0.62])
def test_mask_parity(connectivity, density):
    rng = np.random.default_rng(7 * connectivity + int(density * 100))
    H, W = 48, 128
    mask = rng.random((H, W)) < density
    mj = jnp.asarray(mask)
    lin = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    lab = jnp.where(mj, lin, _INF)
    m = mj.astype(jnp.int32)
    got, _ = _outer_fixed_point(lab, m, connectivity=connectivity, mask=mj)
    ref = _propagate(lab, mj, connectivity, 1024)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_region_parity():
    rng = np.random.default_rng(3)
    H, W = 48, 128
    mask = rng.random((H, W)) < 0.55
    m = jnp.asarray(mask).astype(jnp.int32)
    lin = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    got, _ = _outer_fixed_point(lin, m, region=True)
    ref = _propagate_region(lin, m)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_cap_is_perf_knob_not_correctness():
    """An in-kernel cap of 1 must still reach the same outer fixed point."""
    rng = np.random.default_rng(11)
    H, W = 32, 128
    mask = rng.random((H, W)) < 0.5
    mj = jnp.asarray(mask)
    lin = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    lab = jnp.where(mj, lin, _INF)
    m = mj.astype(jnp.int32)
    cur = lab
    for _ in range(128):
        new = stripe_converge(cur, m, connectivity=1, cap=1,
                              interpret=True)
        new = col_segmented_min_scan(new, m, interpret=True)
        if bool(jnp.all(new == cur)):
            break
        cur = new
    ref = _propagate(lab, mj, 1, 1024)
    np.testing.assert_array_equal(np.asarray(cur), np.asarray(ref))


def test_h_stripe_divides():
    assert _h_stripe(2048, 2048) is not None
    s = _h_stripe(2048, 2048)
    assert 2048 % s == 0 and s % 8 == 0
    assert _h_stripe(48, 128) == 48 or 48 % _h_stripe(48, 128) == 0
