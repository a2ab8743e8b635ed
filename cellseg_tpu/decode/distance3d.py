"""3D distance-prediction instance decoding (KIT-GE capability).

The reference's 3D branch of `distance_postprocessing`
(KIT-GE segmentation/inference/postprocessing.py:46-185, input_3d=True):

  1. anisotropic Gaussian smoothing, σ = (0.5, 1.0, 1.0)
  2. mask = cell > th_cell; seeds like 2D but with an area ≤ 8 floor
  3. seed-decay rescue removing only area ≤ 8 seeds (:104-112)
  4. local splitting when ≥ n_splitting cells (:115-135): re-seed from
     cell − 0.5·borders > th_local, drop area ≤ 16, then point seeds at
     the local maxima of the masked cell prediction (peak_local_max,
     min_distance 6) — and arm the oversize-splitting pass
  5. optional z-seed fusing: binary closing with a (3,1,1) kernel (:137-141)
  6. marker watershed on −cell within the mask (:144)
  7. iterative oversize-cell splitting at thresholds [.5, .6, .75]
     (:164-183), only when step 4 armed it

Note the reference's own 3D entry point is ImportError-broken
(infer.py:10 imports a nonexistent inference_3d_ctc — SURVEY.md §4), so
there is no runnable upstream to bit-match; this is a faithful host-side
reimplementation of the functions that DO exist. The host flood uses the
full 26-neighborhood.
"""

from __future__ import annotations

import numpy as np


def _label3d(mask: np.ndarray) -> np.ndarray:
    """26-connectivity 3D labeling (skimage measure.label default for 3D)."""
    from scipy.ndimage import label

    out, _ = label(mask, structure=np.ones((3, 3, 3), dtype=bool))
    return out


def _remove_small(seeds: np.ndarray, max_area: float) -> np.ndarray:
    ids, counts = np.unique(seeds[seeds > 0], return_counts=True)
    kill = set(ids[counts <= max_area].tolist())
    if kill:
        seeds = np.where(np.isin(seeds, list(kill)), 0, seeds)
    return _label3d(seeds > 0)


def peak_local_max_3d(volume: np.ndarray, min_distance: int = 6) -> np.ndarray:
    """Point seeds at local maxima (capability analog of skimage
    peak_local_max: square footprint of side 2·min_distance+1, positive
    values only)."""
    from scipy.ndimage import maximum_filter

    size = 2 * min_distance + 1
    local_max = maximum_filter(volume, size=size, mode="constant")
    return (volume > 0) & (volume == local_max)


def watershed3d_host(image: np.ndarray, markers: np.ndarray,
                     mask: np.ndarray, max_iters: int = 4096) -> np.ndarray:
    """Vectorized minimax-path watershed in 3D (26-neighborhood).

    Each masked voxel is assigned to the marker with the lexicographically
    smallest (minimax pass-height, steps at that maximum, marker id) key —
    the same first-arrival plateau semantics as the 2D device watershed
    (ops/watershed.py): the step-count plane splits equal-elevation
    plateaus geodesically between markers and protects seed voxels
    (a seed has hops 0; any rival front arrives with hops ≥ 1 and a cost
    ≥ the seed's own elevation, so seeds are never relabeled — matching
    skimage's fixed markers). Iterative whole-volume relaxation (26
    shifted min/max passes per sweep) replaces the earlier per-voxel
    Python priority flood, which was impractically slow beyond ~1 Mvox;
    sweeps converge in O(basin diameter) iterations at numpy C speed.
    """
    big = np.float64(3.0e38)
    inf_hops = np.int64(2 ** 62)
    mask = mask.astype(bool)
    nz, h, w = image.shape
    e = np.where(mask, image.astype(np.float64), big)
    seeded = (markers > 0) & mask
    cost = np.where(seeded, e, big)
    hops = np.where(seeded, np.int64(0), inf_hops)
    label = np.where(seeded, markers.astype(np.int64), 0)
    offsets = [(dz, dy, dx)
               for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
               if (dz, dy, dx) != (0, 0, 0)]
    for _ in range(max_iters):
        pc = np.pad(cost, 1, constant_values=big)
        ph = np.pad(hops, 1, constant_values=inf_hops)
        pl = np.pad(label, 1, constant_values=0)
        new_cost = cost.copy()
        new_hops = hops.copy()
        new_label = label.copy()
        for dz, dy, dx in offsets:
            nc = pc[1 + dz:1 + dz + nz, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
            nh = ph[1 + dz:1 + dz + nz, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
            nl = pl[1 + dz:1 + dz + nz, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
            cand = np.maximum(nc, e)  # minimax path cost through neighbor
            # steps-at-max-level count (reset on climb), matching the 2D
            # device watershed's flood-order model (ops/watershed.py)
            cand_h = np.where(nh == inf_hops, inf_hops,
                              np.where(e > nc, np.int64(1), nh + 1))
            cost_eq = cand == new_cost
            better = (cand < new_cost) | (cost_eq & (
                (cand_h < new_hops)
                | ((cand_h == new_hops) & (nl > 0) & (nl < new_label))))
            better &= mask & (nl > 0)
            np.copyto(new_cost, cand, where=better)
            np.copyto(new_hops, cand_h, where=better)
            np.copyto(new_label, nl, where=better)
        if (np.array_equal(new_label, label)
                and np.array_equal(new_hops, hops)
                and np.array_equal(new_cost, cost)):
            break
        cost, hops, label = new_cost, new_hops, new_label
    return np.where(mask, label, 0)


def decode_distance_3d(border_pred: np.ndarray, cell_pred: np.ndarray,
                       th_cell: float = 0.07, th_seed: float = 0.45,
                       n_splitting: int = 40, fuse_z_seeds: bool = False,
                       th_local: float = 0.25) -> np.ndarray:
    """(Z, H, W) border/cell predictions → int64 instance labels."""
    from scipy.ndimage import binary_closing, gaussian_filter

    cell = gaussian_filter(cell_pred.astype(np.float32),
                           sigma=(0.5, 1.0, 1.0))
    borders = np.clip(border_pred.astype(np.float32), 0, 1)
    mask = cell > th_cell

    borders_t = np.tan(borders ** 2)
    borders_t[borders_t < 0.05] = 0
    borders_t = np.clip(borders_t, 0, 1)
    cleaned = cell - borders_t

    seeds = _label3d(cleaned > th_seed)
    ids, counts = np.unique(seeds[seeds > 0], return_counts=True)
    min_area = max(0.10 * counts.mean(), 8.0) if counts.size else 8.0
    seeds = _remove_small(seeds, min_area)

    # seed-decay rescue (area <= 8 only, :104-112)
    th = th_seed
    while seeds.max() == 0 and th > 0.05:
        th -= 0.1
        seeds = _remove_small(_label3d(cleaned > th), 8.0)

    apply_splitting = False
    if seeds.max() >= n_splitting:
        # slice-wise undersegmentation: re-seed from corrected borders
        seeds = _label3d((cell - 0.5 * borders) > th_local)
        seeds = _remove_small(seeds, 16.0)
        prediction = cell * (seeds > 0)
        seeds = _label3d(peak_local_max_3d(prediction, min_distance=6))
        apply_splitting = True

    if fuse_z_seeds:
        fused = binary_closing(seeds > 0, np.ones((3, 1, 1), dtype=bool))
        seeds = _label3d(fused)

    labels = watershed3d_host(-cell, seeds, mask)

    if apply_splitting:
        labels = split_oversized_3d(labels, cell)
    return labels


def split_oversized_3d(labels: np.ndarray, cell: np.ndarray) -> np.ndarray:
    """Iteratively split cells larger than 1.4x the mean volume
    (reference :164-183): within each oversized cell, re-threshold the
    cell prediction at [.5, .6, .75] until multiple seeds appear, then
    re-watershed inside the cell and assign fresh ids."""
    labels = labels.copy()
    ids, volumes = np.unique(labels[labels > 0], return_counts=True)
    if ids.size == 0:
        return labels
    mean_vol = volumes.mean()
    for nucleus_id, vol in zip(ids, volumes):
        if vol <= mean_vol + 0.4 * mean_vol:
            continue
        nucleus_bin = labels == nucleus_id
        cell_nucleus = cell * nucleus_bin
        for th in (0.50, 0.60, 0.75):
            new_seeds = _label3d(cell_nucleus > th)
            if new_seeds.max() > 1:
                new_cells = watershed3d_host(-cell_nucleus, new_seeds,
                                             nucleus_bin)
                for new_id in np.unique(new_cells[new_cells > 0]):
                    labels[new_cells == new_id] = labels.max() + 1
                break
    return labels
