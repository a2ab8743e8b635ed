"""3-class instance decoding: interior probability → instance label map.

Reference decode chain (baseline/predict.py:110-113):
  P(interior) > 0.5 → remove_small_holes (64 px, 4-conn)
                    → remove_small_objects (16 px, 4-conn)
                    → measure.label (8-conn)

`decode_interior_prob` runs the whole chain on device (three CC passes via
ops/cc.py — instances never round-trip to host); the host variant is the
scipy-based golden reference.
"""

from __future__ import annotations

import jax
import numpy as np

from ..ops.cc import (
    label_components,
    remove_small_holes_jax,
    remove_small_objects_jax,
)
from ..ops.host_morphology import (
    connected_components,
    remove_small_holes,
    remove_small_objects,
)


@jax.jit
def decode_interior_prob(prob_interior: jax.Array) -> jax.Array:
    """(H, W) interior probability → (H, W) int32 instance labels, on device."""
    mask = prob_interior > 0.5
    mask = remove_small_holes_jax(mask, area_threshold=64, connectivity=1)
    mask = remove_small_objects_jax(mask, min_size=16, connectivity=1)
    return label_components(mask, connectivity=2)


def decode_interior_prob_host(prob_interior: np.ndarray) -> np.ndarray:
    """Host golden path with identical semantics (scipy.ndimage)."""
    mask = prob_interior > 0.5
    mask = remove_small_holes(mask, area_threshold=64, connectivity=1)
    mask = remove_small_objects(mask, min_size=16, connectivity=1)
    return connected_components(mask, connectivity=2)
