"""Parity: Pallas VMEM segmented scans vs the XLA scan (interpret mode).

The device path is additionally covered by the CC fuzz goldens when the
kernels are enabled on TPU (ops/cc.py picks them up via scans_supported).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cellseg_tpu.ops.cc import _INF_I, _segmented_min_scan  # noqa: E402
from cellseg_tpu.ops.pallas.scans import (  # noqa: E402
    col_segmented_min_scan,
    row_segmented_min_scan,
)


def _case(h, w, density, seed):
    rng = np.random.default_rng(seed)
    mask = rng.random((h, w)) < density
    lin = np.arange(h * w, dtype=np.int32).reshape(h, w)
    lab = np.where(mask, lin, _INF_I)
    return jnp.asarray(lab), jnp.asarray(mask)


@pytest.mark.parametrize("h,w", [(64, 128), (128, 256), (40, 384)])
@pytest.mark.parametrize("density", [0.0, 0.35, 0.8, 1.0])
def test_row_scan_matches_xla(h, w, density):
    lab, mask = _case(h, w, density, seed=h + int(density * 10))
    want = np.asarray(_segmented_min_scan(lab, mask, axis=1))
    got = np.asarray(row_segmented_min_scan(lab, mask, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("h,w", [(64, 128), (128, 256), (96, 384)])
@pytest.mark.parametrize("density", [0.0, 0.35, 0.8, 1.0])
def test_col_scan_matches_xla(h, w, density):
    lab, mask = _case(h, w, density, seed=2 * h + int(density * 10))
    want = np.asarray(_segmented_min_scan(lab, mask, axis=0))
    got = np.asarray(col_segmented_min_scan(lab, mask, interpret=True))
    np.testing.assert_array_equal(got, want)


def _brute_region_scan(lab, m, axis):
    """O(n^2) reference: per-pixel min over its maximal equal-m run."""
    lab = np.array(lab)
    m = np.array(m)
    out = np.empty_like(lab)
    if axis == 0:
        lab, m, out = lab.T, m.T, out.T
    h, w = lab.shape
    for i in range(h):
        j = 0
        while j < w:
            k = j
            while k + 1 < w and m[i, k + 1] == m[i, j]:
                k += 1
            out[i, j:k + 1] = lab[i, j:k + 1].min()
            j = k + 1
    return out.T if axis == 0 else out


@pytest.mark.parametrize("h,w", [(64, 128), (40, 384)])
@pytest.mark.parametrize("density", [0.0, 0.35, 0.8, 1.0])
def test_region_scan_xla_matches_brute(h, w, density):
    from cellseg_tpu.ops.cc import _region_min_scan

    rng = np.random.default_rng(h + int(density * 10))
    m = (rng.random((h, w)) < density).astype(np.int32)
    lab = rng.integers(0, 1 << 20, (h, w)).astype(np.int32)
    for axis in (0, 1):
        want = _brute_region_scan(lab, m, axis)
        got = np.asarray(_region_min_scan(
            jnp.asarray(lab), jnp.asarray(m), axis=axis))
        np.testing.assert_array_equal(got, want, err_msg=f"axis {axis}")


@pytest.mark.parametrize("h,w", [(64, 128), (128, 256)])
@pytest.mark.parametrize("density", [0.0, 0.35, 0.8, 1.0])
def test_region_scan_pallas_matches_xla(h, w, density):
    from cellseg_tpu.ops.cc import _region_min_scan

    rng = np.random.default_rng(3 * h + int(density * 10))
    m = (rng.random((h, w)) < density).astype(np.int32)
    lab = rng.integers(0, 1 << 20, (h, w)).astype(np.int32)
    lab_j, m_j = jnp.asarray(lab), jnp.asarray(m)
    want_r = np.asarray(_region_min_scan(lab_j, m_j, axis=1))
    got_r = np.asarray(row_segmented_min_scan(
        lab_j, m_j, interpret=True, region=True))
    np.testing.assert_array_equal(got_r, want_r)
    want_c = np.asarray(_region_min_scan(lab_j, m_j, axis=0))
    got_c = np.asarray(col_segmented_min_scan(
        lab_j, m_j, interpret=True, region=True))
    np.testing.assert_array_equal(got_c, want_c)
