"""Flow-field training targets (cellpose capability).

The cellpose representation (required by the reference's
cellpose-omnipose-KIT-GE wrappers, e.g. test_cellpose_cyto2_grey.py) encodes
each instance as a 2-channel unit flow field pointing toward the cell
center, computed by heat diffusion from the cell median-center; instances
are recovered by following the flows (decode/flow.py).

Host implementation (runs at training-set build time). The diffusion is a
vectorized full-image iteration restricted to cell interiors — no per-cell
Python loop over pixels.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage as ndi


def masks_to_flows(label: np.ndarray, n_iter: int | None = None):
    """Instance labels → (flow (2,H,W) float32, cellprob mask (H,W) bool).

    Heat diffusion: a unit heat source at each cell's internal center
    diffuses within the cell; the normalized gradient of log-heat is the
    flow. n_iter defaults to ~2 × max cell diameter.
    """
    label = np.asarray(label)
    h, w = label.shape
    mask = label > 0

    # heat sources: per-cell pixel nearest the cell's centroid (guaranteed
    # inside via EDT-weighted pick)
    heat = np.zeros((h, w), dtype=np.float64)
    ids = np.unique(label)
    ids = ids[ids > 0]
    max_diam = 1
    for lab in ids:
        ys, xs = np.nonzero(label == lab)
        cy, cx = ys.mean(), xs.mean()
        k = np.argmin((ys - cy) ** 2 + (xs - cx) ** 2)
        heat[ys[k], xs[k]] = 1.0
        diam = max(ys.max() - ys.min(), xs.max() - xs.min()) + 1
        max_diam = max(max_diam, int(diam))
    if n_iter is None:
        n_iter = 2 * max_diam

    # diffusion restricted to cell interiors (source re-injected each step)
    src = heat.copy()
    for _ in range(n_iter):
        heat = ndi.uniform_filter(heat, size=3, mode="constant")
        heat *= mask
        heat += src

    logh = np.log(heat + 1e-20)
    gy = np.zeros_like(logh)
    gx = np.zeros_like(logh)
    gy[1:-1, :] = (logh[2:, :] - logh[:-2, :]) / 2
    gx[:, 1:-1] = (logh[:, 2:] - logh[:, :-2]) / 2
    norm = np.sqrt(gy**2 + gx**2) + 1e-20
    flow = np.stack([gy / norm, gx / norm]).astype(np.float32)
    flow *= mask[None]
    return flow, mask
