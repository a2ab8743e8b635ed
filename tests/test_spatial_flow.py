"""Seam-parity tests for the sharded flow tracker (parallel/spatial_flow.py)
on the 8-CPU test mesh: the sharded `propagate` decode must be bit-equal to
the single-device decode_flow(method='propagate') after sequential
relabeling, including for cells that straddle stripe boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cellseg_tpu.decode.flow import decode_flow
from cellseg_tpu.metrics import relabel_sequential
from cellseg_tpu.parallel.spatial import AXIS
from cellseg_tpu.parallel.spatial_flow import spatial_decode_flow


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:4]), (AXIS,))


def _disk_world(h, w, centers, r):
    lbl = np.zeros((h, w), np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    for i, (cy, cx) in enumerate(centers):
        d = (yy - cy) ** 2 + (xx - cx) ** 2
        lbl[d <= r * r] = i + 1
    return lbl


def _flows_and_prob(lbl):
    from cellseg_tpu.pipeline.flow_labels import masks_to_flows

    flow, mask = masks_to_flows(lbl)  # (2, H, W), (H, W)
    flow_hwc = np.moveaxis(flow, 0, -1).astype(np.float32)
    prob = np.where(mask, 4.0, -4.0).astype(np.float32)
    return flow_hwc, prob


@pytest.mark.parametrize("seed_rows", [True])
def test_spatial_flow_matches_single_seam_cells(mesh, seed_rows):
    h, w = 256, 128  # 4 stripes of 64: cells at rows 64/128/192 cross seams
    centers = [(32, 32), (64, 90), (128, 40), (192, 100), (230, 30)]
    lbl = _disk_world(h, w, centers, r=18)
    flow, prob = _flows_and_prob(lbl)

    want = np.asarray(decode_flow(jnp.asarray(flow), jnp.asarray(prob),
                                  method="propagate"))
    want = relabel_sequential(want)
    got = spatial_decode_flow(flow, prob, mesh)
    assert np.array_equal(got, want), (
        f"{(got != want).sum()} px differ; "
        f"{got.max()} vs {want.max()} instances")
    # every seeded cell decoded
    assert got.max() == len(centers)


def test_spatial_flow_empty_canvas(mesh):
    h, w = 128, 128
    flow = np.zeros((h, w, 2), np.float32)
    prob = np.full((h, w), -4.0, np.float32)
    got = spatial_decode_flow(flow, prob, mesh)
    assert got.max() == 0
