"""Instance-map → 3-class (background/interior/boundary) label conversion.

Reference semantics (data/pre_process_3class.py:31-56):
  boundary  = find_boundaries(inst, mode='inner')  # 4-conn label difference
  boundary  = binary_dilation(boundary, disk(1))   # plus-shaped SE
  interior  = (~boundary & inst>0) with components < 16 px removed (4-conn)
  output    = 0 bg / 1 interior / 2 boundary (boundary wins)
"""

from __future__ import annotations

import numpy as np

from ..ops.host_morphology import (
    binary_dilation_cross,
    find_boundaries_inner,
    remove_small_objects,
)


def create_interior_map(inst_map: np.ndarray) -> np.ndarray:
    """Host conversion; bit-parity with the reference on int16 inputs."""
    inst_map = np.asarray(inst_map)
    boundary = find_boundaries_inner(inst_map)
    boundary = binary_dilation_cross(boundary)
    interior_temp = np.logical_and(~boundary, inst_map > 0)
    interior_temp = remove_small_objects(interior_temp, min_size=16)
    interior = np.zeros_like(inst_map, dtype=np.uint8)
    interior[interior_temp] = 1
    interior[boundary] = 2
    return interior
