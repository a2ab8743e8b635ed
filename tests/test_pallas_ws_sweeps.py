"""Parity: Pallas fused watershed relaxation vs k plain sweeps
(interpret mode on CPU; the device path is additionally covered by the
watershed host-golden tests when the kernel is enabled on TPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cellseg_tpu.ops.pallas.ws_sweeps import fused_ws_sweeps  # noqa: E402
from cellseg_tpu.ops.watershed import (  # noqa: E402
    _BIG,
    _INF_HOPS,
    relax_once,
)


def _world(h, w, n_seeds, seed, quantize=False):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(h, w)).astype(np.float32)
    if quantize:
        img = np.round(img * 2) / 2  # plateau-heavy elevation
    mask = rng.random((h, w)) < 0.85
    markers = np.zeros((h, w), np.int32)
    ys = rng.integers(0, h, n_seeds)
    xs = rng.integers(0, w, n_seeds)
    markers[ys, xs] = np.arange(1, n_seeds + 1)
    markers *= mask
    e = np.where(mask, img, _BIG).astype(np.float32)
    seeded = markers > 0
    cost = np.where(seeded, e, _BIG).astype(np.float32)
    hops = np.where(seeded, 0, int(_INF_HOPS)).astype(np.int32)
    label = np.where(seeded, markers, 0).astype(np.int32)
    return (jnp.asarray(e), jnp.asarray(mask), jnp.asarray(cost),
            jnp.asarray(hops), jnp.asarray(label))


@pytest.mark.parametrize("h,w", [(128, 128), (192, 256)])
@pytest.mark.parametrize("quantize", [False, True])
def test_fused_matches_k_plain_sweeps(h, w, quantize):
    e, mask, cost, hops, label = _world(h, w, n_seeds=24,
                                        seed=h + int(quantize),
                                        quantize=quantize)
    k, stripe = 8, 64
    want = (cost, hops, label)
    for _ in range(k):
        want = relax_once(want[0], want[1], want[2], e, mask)
    got = fused_ws_sweeps(e, mask, cost, hops, label, k=k, stripe=stripe,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))


def test_fused_iterates_to_same_fixed_point():
    e, mask, cost, hops, label = _world(128, 128, n_seeds=12, seed=7)
    k, stripe = 8, 32
    plain = (cost, hops, label)
    for _ in range(48):
        plain = relax_once(plain[0], plain[1], plain[2], e, mask)
    fused = (cost, hops, label)
    for _ in range(6):
        fused = fused_ws_sweeps(e, mask, fused[0], fused[1], fused[2],
                                k=k, stripe=stripe, interpret=True)
    np.testing.assert_array_equal(np.asarray(fused[2]),
                                  np.asarray(plain[2]))
