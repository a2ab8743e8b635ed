"""Parity tests for the block-local watershed convergence kernel
(ops/pallas/ws_local.py) in interpret mode on the CPU test mesh.

Contract: composed with one global relax_once to an outer fixed point,
the labels equal the plain sweep loop's fixed point. On continuous
elevations (no exact (cost, hops) ties) the fixed point is unique, so
equality is exact; quantized plateaus are pinned behaviorally by
tests/test_watershed_ties.py.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from cellseg_tpu.ops.watershed import _BIG, _INF_HOPS, relax_once
from cellseg_tpu.ops.pallas.ws_local import _ws_stripe, stripe_ws_converge


def _state(image, markers, mask):
    e = jnp.where(mask, image.astype(jnp.float32), _BIG)
    seeded = markers > 0
    cost = jnp.where(seeded, e, _BIG)
    hops = jnp.where(seeded, 0, _INF_HOPS)
    label = jnp.where(seeded, markers.astype(jnp.int32), 0)
    return e, cost, hops, label


def _plain_fixed_point(e, mask, cost, hops, label, iters=400):
    for _ in range(iters):
        nc, nh, nl = relax_once(cost, hops, label, e, mask)
        if (bool(jnp.all(nl == label)) and bool(jnp.all(nh == hops))
                and bool(jnp.all(nc == cost))):
            return cost, hops, label
        cost, hops, label = nc, nh, nl
    raise AssertionError("plain loop did not converge")


def _local_fixed_point(e, mask, cost, hops, label, outer=64):
    for _ in range(outer):
        nc, nh, nl = stripe_ws_converge(e, mask, cost, hops, label,
                                        cap=64, interpret=True)
        nc, nh, nl = relax_once(nc, nh, nl, e, mask)
        if (bool(jnp.all(nl == label)) and bool(jnp.all(nh == hops))
                and bool(jnp.all(nc == cost))):
            return cost, hops, label
        cost, hops, label = nc, nh, nl
    raise AssertionError("local-converge loop did not converge")


def test_ws_local_matches_plain_on_continuous_terrain():
    rng = np.random.default_rng(5)
    h, w = 48, 128
    yy, xx = np.mgrid[0:h, 0:w]
    cell = np.zeros((h, w), np.float32)
    markers = np.zeros((h, w), np.int32)
    for i, (cy, cx) in enumerate([(12, 20), (12, 70), (34, 40), (36, 100)]):
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        cell = np.maximum(cell, np.clip(1.0 - d / 14.0, 0, None))
        markers[cy, cx] = i + 1
    # continuous noise kills exact ties → unique fixed point
    cell = cell + rng.random((h, w)).astype(np.float32) * 1e-3
    mask = cell > 0.05

    e, cost, hops, label = _state(jnp.asarray(-cell), jnp.asarray(markers),
                                  jnp.asarray(mask))
    mj = jnp.asarray(mask)
    ref = _plain_fixed_point(e, mj, cost, hops, label)
    got = _local_fixed_point(e, mj, cost, hops, label)
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]))


def test_ws_stripe_config():
    assert _ws_stripe(2048, 2048) is not None
    s = _ws_stripe(2048, 2048)
    assert 2048 % s == 0 and s % 8 == 0
