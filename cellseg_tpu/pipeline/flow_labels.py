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

    flow = _unit_gradient(np.log(heat + 1e-20))
    flow *= mask[None]
    return flow, mask


def _unit_gradient(phi: np.ndarray) -> np.ndarray:
    """Normalized gradient of a scalar field: central differences inside,
    one-sided at the image frame — a zero gradient on the frame would give
    border-touching cells degenerate (axis-collapsed) flow targets that
    strand pixels at decode time."""
    gy = np.zeros_like(phi)
    gx = np.zeros_like(phi)
    gy[1:-1, :] = (phi[2:, :] - phi[:-2, :]) / 2
    gy[0, :] = phi[1, :] - phi[0, :]
    gy[-1, :] = phi[-1, :] - phi[-2, :]
    gx[:, 1:-1] = (phi[:, 2:] - phi[:, :-2]) / 2
    gx[:, 0] = phi[:, 1] - phi[:, 0]
    gx[:, -1] = phi[:, -1] - phi[:, -2]
    norm = np.sqrt(gy**2 + gx**2) + 1e-20
    return np.stack([gy / norm, gx / norm]).astype(np.float32)


def masks_to_flows_omni(label: np.ndarray):
    """Instance labels → omnipose-style targets.

    Returns ``(flow (2,H,W) float32, dist (H,W) float32, boundary (H,W)
    bool)``. The omnipose representation (capability target of the
    reference's omnipose wrapper, cellpose-omnipose-KIT-GE/
    test_omnipose_cyto2_grey.py:23-28) replaces the cellpose
    center-seeking heat flow with the gradient of the distance-to-boundary
    field: flows converge to the cell's medial skeleton instead of a
    single center point, which keeps trajectories inside thin/elongated
    cells, and the regressed distance field doubles as the cell mask
    (dist > 0) at decode time. This is an analog, not a numerical port of
    omnipose internals:

    - φ is the per-cell Euclidean distance transform where TOUCHING
      NEIGHBOR CELLS count as boundary (each cell's EDT is computed
      against everything that is not that cell), playing the role of
      omnipose's eikonal solve;
    - the flow target is the normalized gradient of φ after two masked
      3×3 mean relaxations (the smoothing role of omnipose's FIM update —
      raw EDT gradients are piecewise-constant staircases);
    - the distance target is raw φ inside cells and −1 on background
      (omnipose regresses its boundary field below zero on background so
      `dist > 0` recovers the mask with a margin);
    - the boundary target is the φ ≤ 1.5 shell (pixels touching the cell
      edge, including diagonal contacts at √2).
    """
    label = np.asarray(label)
    h, w = label.shape
    mask = label > 0

    phi = np.zeros((h, w), dtype=np.float64)
    for lab, sl in enumerate(ndi.find_objects(label), start=1):
        if sl is None:
            continue
        # pad the bbox by 1 so the EDT sees the off-bbox surroundings as
        # boundary exactly when they are (other cells / background), and
        # the image frame as non-boundary is NOT assumed: cells cut by the
        # frame keep distance-to-frame=bbox-edge semantics like omnipose.
        y0, y1 = max(sl[0].start - 1, 0), min(sl[0].stop + 1, h)
        x0, x1 = max(sl[1].start - 1, 0), min(sl[1].stop + 1, w)
        cell = label[y0:y1, x0:x1] == lab
        d = ndi.distance_transform_edt(cell)
        phi[y0:y1, x0:x1] = np.where(cell, d, phi[y0:y1, x0:x1])

    # two masked 3×3 mean relaxations smooth the EDT staircase before the
    # gradient; re-imposing φ=0 off-mask keeps the inward pull at edges
    smooth = phi.copy()
    for _ in range(2):
        smooth = ndi.uniform_filter(smooth, size=3, mode="constant")
        smooth *= mask
    flow = _unit_gradient(smooth)
    flow *= mask[None]

    dist = np.where(mask, phi, -1.0).astype(np.float32)
    boundary = mask & (phi <= 1.5)
    return flow, dist, boundary
