import numpy as np
import pytest

from cellseg_tpu import native
from cellseg_tpu.metrics import f1 as f1mod
from cellseg_tpu.ops.host_morphology import connected_components

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native module unavailable")


def test_native_cc_matches_scipy(rng):
    for p in (0.3, 0.5, 0.65):
        m = rng.random((120, 90)) < p
        for conn in (1, 2):
            got = native.label_components(m, conn)
            want = connected_components(m, conn)
            assert np.array_equal(got, want), (p, conn)


def test_native_overlap_matches_numpy(rng):
    x = rng.integers(0, 12, (64, 64))
    y = rng.integers(0, 9, (64, 64))
    got = native.label_overlap(x, y)
    want = f1mod.label_overlap(x, y)
    assert np.array_equal(got, want)


def test_native_relabel_matches():
    m = np.array([[0, 5, 5], [3, 0, 9]], np.int32)
    got = native.relabel_sequential(m)
    want = f1mod.relabel_sequential(m)
    assert np.array_equal(got, want)


def test_native_remove_small(rng):
    m = np.zeros((40, 40), bool)
    m[1:5, 1:5] = True      # 16 px kept
    m[10:13, 10:15] = True  # 15 px removed
    lab = native.label_components(m, 1)
    out = native.remove_small(lab, int(lab.max()), 16)
    assert (out[2, 2] > 0) and (out[11, 11] == 0)


def test_native_overlap_large(rng):
    """Large-image overlap: native and numpy paths agree."""
    x = rng.integers(0, 500, (1500, 1500)).astype(np.int32)
    y = rng.integers(0, 500, (1500, 1500)).astype(np.int32)
    got = native.label_overlap(x, y)
    fused = x.ravel().astype(np.int64) * (int(y.max()) + 1) + y.ravel()
    want = np.bincount(fused, minlength=got.size).reshape(got.shape)
    assert np.array_equal(got, want)
