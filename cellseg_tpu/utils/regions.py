"""Minimal region properties for labeled masks (numpy, no skimage).

Provides the subset of skimage.measure.regionprops the distance pipeline
needs (reference train_data_representations.py:91-96,146-160): area,
centroid, equivalent diameter, minor/major axis lengths (from central moments).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Region:
    label: int
    area: int
    centroid: tuple[float, float]
    equivalent_diameter: float
    minor_axis_length: float
    major_axis_length: float
    bbox: tuple[int, int, int, int]  # (r0, c0, r1, c1) half-open


def region_props(labels: np.ndarray) -> list[Region]:
    labels = np.asarray(labels)
    out: list[Region] = []
    ids = np.unique(labels)
    ids = ids[ids > 0]
    for lab in ids:
        ys, xs = np.nonzero(labels == lab)
        area = ys.size
        cy, cx = ys.mean(), xs.mean()
        # central second moments
        dy, dx = ys - cy, xs - cx
        mu20 = np.mean(dy * dy) + 1 / 12  # pixel extent correction (skimage)
        mu02 = np.mean(dx * dx) + 1 / 12
        mu11 = np.mean(dy * dx)
        common = np.sqrt(max((mu20 - mu02) ** 2 + 4 * mu11**2, 0.0))
        l1 = (mu20 + mu02 + common) / 2
        l2 = (mu20 + mu02 - common) / 2
        minor = 4.0 * np.sqrt(max(l2, 0.0))
        major = 4.0 * np.sqrt(max(l1, 0.0))
        eq_d = np.sqrt(4.0 * area / np.pi)
        out.append(Region(
            label=int(lab), area=int(area), centroid=(float(cy), float(cx)),
            equivalent_diameter=float(eq_d), minor_axis_length=float(minor),
            major_axis_length=float(major),
            bbox=(int(ys.min()), int(xs.min()), int(ys.max()) + 1,
                  int(xs.max()) + 1),
        ))
    return out
