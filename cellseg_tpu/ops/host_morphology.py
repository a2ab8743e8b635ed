"""Host (numpy/scipy) morphology with skimage-parity semantics.

The reference leans on skimage for boundary finding, dilation, small
object/hole removal and connected components (data/pre_process_3class.py:47-52,
baseline/predict.py:113). skimage is not a dependency here; these functions
reproduce the exact semantics on top of scipy.ndimage and are the golden
references for the on-device (jnp/Pallas) implementations in ops/morphology.py
and ops/cc.py.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage as ndi

# 4-connectivity (plus-shaped) structuring element == skimage disk(1) ==
# scipy generate_binary_structure(2, 1).
CROSS = ndi.generate_binary_structure(2, 1)
# 8-connectivity.
FULL = ndi.generate_binary_structure(2, 2)


def _disk(radius: int) -> np.ndarray:
    """skimage.morphology.disk: L2 ball of the given radius."""
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (xx * xx + yy * yy) <= radius * radius


def find_boundaries_inner(label_img: np.ndarray, connectivity: int = 1) -> np.ndarray:
    """Inner-mode boundary pixels of a label image.

    skimage.segmentation.find_boundaries(mode='inner') semantics
    (used at reference data/pre_process_3class.py:47): a foreground pixel is
    a boundary pixel iff grayscale dilation != erosion over the connectivity
    footprint, i.e. any in-footprint neighbor carries a different label.
    Edge-replicate padding reproduces skimage's border behavior (dilation
    pads with -inf, erosion with +inf, so the pad never wins).
    """
    label_img = np.asarray(label_img)
    footprint = ndi.generate_binary_structure(label_img.ndim, connectivity)
    dil = ndi.grey_dilation(label_img, footprint=footprint, mode="nearest")
    ero = ndi.grey_erosion(label_img, footprint=footprint, mode="nearest")
    return (dil != ero) & (label_img != 0)


def binary_dilation_cross(mask: np.ndarray) -> np.ndarray:
    """Binary dilation with the plus-shaped SE (skimage disk(1))."""
    return ndi.binary_dilation(mask, structure=CROSS)


def binary_dilation_disk(mask: np.ndarray, radius: int) -> np.ndarray:
    """Binary dilation with an L2 disk (skimage disk(radius))."""
    return ndi.binary_dilation(mask, structure=_disk(radius))


def remove_small_objects(mask: np.ndarray, min_size: int = 16,
                         connectivity: int = 1) -> np.ndarray:
    """Drop connected components with area strictly below min_size.

    skimage.morphology.remove_small_objects semantics (default 4-connectivity;
    reference data/pre_process_3class.py:52, baseline/predict.py:113).
    """
    structure = ndi.generate_binary_structure(2, connectivity)
    labeled, n = ndi.label(mask, structure=structure)
    if n == 0:
        return mask.astype(bool)
    areas = np.bincount(labeled.ravel())
    keep = areas >= min_size
    keep[0] = False
    return keep[labeled]


def remove_small_holes(mask: np.ndarray, area_threshold: int = 64,
                       connectivity: int = 1) -> np.ndarray:
    """Fill background components with area strictly below area_threshold.

    skimage.morphology.remove_small_holes semantics (default 64 px;
    reference baseline/predict.py:113 uses the default).
    """
    mask = np.asarray(mask).astype(bool)
    filled = remove_small_objects(~mask, min_size=area_threshold,
                                  connectivity=connectivity)
    return ~filled


def connected_components(mask: np.ndarray, connectivity: int = 2) -> np.ndarray:
    """Label connected components in raster first-encounter order.

    skimage.measure.label default semantics for 2D bool input: full
    (8-)connectivity (reference baseline/predict.py:113 uses the default).
    """
    structure = ndi.generate_binary_structure(2, connectivity)
    labeled, _ = ndi.label(mask, structure=structure)
    return labeled
