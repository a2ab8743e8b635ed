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
