"""Distance-regression training targets (KIT-GE capability).

Semantics-parity rebuild of the reference's distance label generation
(KIT-GE segmentation/training/train_data_representations.py):

  - cell distance: per-nucleus Euclidean distance transform, normalized to
    [0,1] by the per-nucleus max (:71-110);
  - neighbor distance: inverted, scaled distance to the nearest other
    nucleus within a radius (:112-142), with touching-cell borders burned
    in (:44-68,166), near-but-not-touching gaps injected via bottom-hat
    closing (:9-41,144-165), a nonlinear rescale and a grayscale closing
    (:168-171).

Host implementation (scipy EDT) — this runs once when building training
sets, not in the training hot loop.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage as ndi

from ..ops.host_morphology import _disk, connected_components
from ..utils.regions import region_props

_K3 = np.ones((3, 3), dtype=bool)


def _nucleus_ids(label: np.ndarray) -> np.ndarray:
    ids = np.unique(label)
    return ids[ids > 0]


def border_label_2d(label: np.ndarray) -> np.ndarray:
    """0 bg / 1 cell / 2 touching-cell border (reference :44-68)."""
    label_bin = label > 0
    boundary = np.zeros(label.shape, dtype=bool)
    for nucleus_id in _nucleus_ids(label):
        nucleus = label == nucleus_id
        boundary |= ndi.binary_dilation(nucleus, _K3) ^ nucleus
    border = boundary ^ (ndi.binary_dilation(label_bin, _K3) ^ label_bin)
    return np.maximum(label_bin.astype(np.int8), 2 * border.astype(np.int8))


def bottom_hat_closing(label: np.ndarray):
    """Gap detection between near-but-not-touching cells (reference :9-41).

    Returns (gap_labels, gap_intensity) where gap_intensity is 1 inside
    gaps with a 0.8 rim for elongated gaps.
    """
    label_bin = np.zeros(label.shape, dtype=bool)
    disk3 = _disk(3)
    for nucleus_id in _nucleus_ids(label):
        nucleus = ndi.binary_closing(label == nucleus_id, disk3)
        label_bin[nucleus] = True

    bottom_hat = ndi.binary_closing(label_bin, disk3) ^ label_bin
    closed = (~label_bin) & bottom_hat

    gap_labels = connected_components(closed.astype(np.uint8), connectivity=2)
    gap_intensity = (gap_labels > 0).astype(np.float32)
    for prop in region_props(gap_labels):
        if prop.minor_axis_length >= 3:
            gap = gap_labels == prop.label
            rim = gap ^ ndi.binary_erosion(
                gap, ndi.generate_binary_structure(2, 1)
            )
            gap_intensity[gap] = 1.0
            gap_intensity[rim] = 0.8
    return gap_labels, gap_intensity


def distance_label_2d(label: np.ndarray, cell_radius: int,
                      neighbor_radius: int):
    """(cell_distance, neighbor_distance) float32 maps (reference :71-173)."""
    label = np.asarray(label)
    label_dist = np.zeros(label.shape, dtype=np.float64)
    label_dist_neighbor = np.zeros(label.shape, dtype=np.float64)
    touching_border = border_label_2d(label) == 2

    props = region_props(label)
    for prop in props:
        cy, cx = np.round(prop.centroid)
        r0 = int(max(cy - cell_radius, 0))
        r1 = int(min(cy + cell_radius, label.shape[0]))
        c0 = int(max(cx - cell_radius, 0))
        c1 = int(min(cx + cell_radius, label.shape[1]))
        nucleus_crop = label[r0:r1, c0:c1] == prop.label
        crop_dist = ndi.distance_transform_edt(nucleus_crop)
        max_dist = crop_dist.max()
        if max_dist <= 0:
            continue
        label_dist[r0:r1, c0:c1] += crop_dist / max_dist

        # neighbor distance within the (possibly larger) neighbor radius
        nr0 = int(max(cy - neighbor_radius, 0))
        nr1 = int(min(cy + neighbor_radius, label.shape[0]))
        nc0 = int(max(cx - neighbor_radius, 0))
        nc1 = int(min(cx + neighbor_radius, label.shape[1]))
        crop = label[nr0:nr1, nc0:nc1]
        if _nucleus_ids(crop).size <= 1:
            continue
        is_this = crop == prop.label
        # distance from each pixel to the nearest OTHER nucleus
        other = (crop != 0) & (~is_this)
        dist_to_other = ndi.distance_transform_edt(~other)
        dist_in_nucleus = dist_to_other * is_this
        if dist_in_nucleus.max() > 0:
            denominator = min(max_dist + 3, dist_in_nucleus.max())
            dist_in_nucleus = np.clip(dist_in_nucleus / denominator, 0, 1)
        else:
            dist_in_nucleus = np.ones_like(dist_in_nucleus)
        label_dist_neighbor[nr0:nr1, nc0:nc1] += (
            (1 - dist_in_nucleus) * is_this
        )

    # inject gaps between near-but-not-touching cells
    gap_labels, gap_intensity = bottom_hat_closing(label)
    for prop in region_props(gap_labels):
        gap = gap_labels == prop.label
        rim = ndi.binary_dilation(gap, _K3) ^ gap
        if prop.area <= 20:
            th = 5
        elif prop.area <= 30:
            th = 8
        elif prop.area <= 50:
            th = 10
        else:
            th = 20
        if np.sum(rim * label_dist_neighbor) < th:  # isolated artifact
            gap_intensity[gap] = 0

    label_dist_neighbor = np.maximum(label_dist_neighbor, gap_intensity)
    label_dist_neighbor = np.maximum(
        label_dist_neighbor, touching_border.astype(np.float64)
    )

    # nonlinear rescale + grayscale closing (reference :168-171)
    label_dist_neighbor = (
        1 / np.sqrt(0.65 + 0.5 * np.exp(-11 * (label_dist_neighbor - 0.75)))
        - 0.19
    )
    label_dist_neighbor = np.clip(label_dist_neighbor, 0, 1)
    label_dist_neighbor = ndi.grey_closing(label_dist_neighbor, size=(3, 3))

    return (label_dist.astype(np.float32),
            label_dist_neighbor.astype(np.float32))
