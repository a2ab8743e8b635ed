from .host_morphology import (
    find_boundaries_inner,
    binary_dilation_cross,
    binary_dilation_disk,
    remove_small_objects,
    remove_small_holes,
    connected_components,
)

__all__ = [
    "find_boundaries_inner",
    "binary_dilation_cross",
    "binary_dilation_disk",
    "remove_small_objects",
    "remove_small_holes",
    "connected_components",
]
