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

    # heat sources: per-cell pixel nearest the cell's centroid. One
    # find_objects pass + per-bbox work — a full-image scan per id would
    # be O(K·H·W) at training-set build time (4 MP × 2000 cells ≈ 8e9
    # comparisons per frame).
    heat = np.zeros((h, w), dtype=np.float64)
    max_diam = 1
    for lab, sl in enumerate(ndi.find_objects(label), start=1):
        if sl is None:
            continue
        ys, xs = np.nonzero(label[sl] == lab)
        if ys.size == 0:
            continue
        cy, cx = ys.mean(), xs.mean()
        k = np.argmin((ys - cy) ** 2 + (xs - cx) ** 2)
        heat[sl[0].start + ys[k], sl[1].start + xs[k]] = 1.0
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
    # central differences inside, one-sided at the image frame — a zero
    # gradient on the frame would give border-touching cells degenerate
    # (axis-collapsed) flow targets that strand pixels at decode time
    gy = np.zeros_like(logh)
    gx = np.zeros_like(logh)
    gy[1:-1, :] = (logh[2:, :] - logh[:-2, :]) / 2
    gy[0, :] = logh[1, :] - logh[0, :]
    gy[-1, :] = logh[-1, :] - logh[-2, :]
    gx[:, 1:-1] = (logh[:, 2:] - logh[:, :-2]) / 2
    gx[:, 0] = logh[:, 1] - logh[:, 0]
    gx[:, -1] = logh[:, -1] - logh[:, -2]
    norm = np.sqrt(gy**2 + gx**2) + 1e-20
    flow = np.stack([gy / norm, gx / norm]).astype(np.float32)
    flow *= mask[None]
    return flow, mask
