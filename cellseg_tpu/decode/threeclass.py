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
    """(H, W) interior probability → (H, W) int32 instance labels, on device.

    Fused: the small-object pass's converged 4-conn roots seed the final
    8-conn labeling (4-conn components are subsets of 8-conn components and
    roots are component-min indices, so the seeded propagation converges to
    the identical fixed point in a couple of diagonal-merge sweeps instead
    of a full pass).
    """
    import jax.numpy as jnp

    from ..ops.cc import (
        _INF,
        _propagate,
        _root_labels,
        sequential_from_roots,
        small_component_mask_by_sort,
    )

    mask = prob_interior > 0.5
    mask = remove_small_holes_jax(mask, area_threshold=64, connectivity=1)

    # small-object removal, keeping the 4-conn roots for reuse
    roots4 = _root_labels(mask, connectivity=1)
    small = small_component_mask_by_sort(
        roots4.ravel(), mask.ravel(), 16).reshape(mask.shape)
    mask2 = jnp.logical_and(mask, ~small)

    # final 8-conn labeling seeded by the surviving 4-conn roots
    lab0 = jnp.where(mask2, roots4, _INF)
    lab = _propagate(lab0, mask2, connectivity=2, max_iters=1024)
    return sequential_from_roots(lab, mask2, connectivity=2)


def decode_interior_prob_host(prob_interior: np.ndarray) -> np.ndarray:
    """Host golden path with identical semantics (scipy.ndimage)."""
    mask = prob_interior > 0.5
    mask = remove_small_holes(mask, area_threshold=64, connectivity=1)
    mask = remove_small_objects(mask, min_size=16, connectivity=1)
    return connected_components(mask, connectivity=2)


@jax.jit
def decode_boundary_watershed(prob_interior: jax.Array,
                              prob_boundary: jax.Array,
                              th_seed: float = 0.7) -> jax.Array:
    """Boundary-aware instance decode for the 3-class head (beyond-parity
    option; the reference only does CC on interior, predict.py:113, which
    merges touching cells wherever their boundary ridge thins — measured
    as a ~12% instance deficit on touching-cell data, see BASELINE.md).

    Same trained model, better decoder: seeds are the eroded cell cores
    where interior is confidently above the boundary
    (P_int − P_bnd > th_seed), the mask is the reference's hole/object-
    filtered interior, and a marker watershed on −P_int assigns the
    contested ridge pixels. Fully on device.
    """
    import jax.numpy as jnp

    from ..ops.watershed import watershed_jax

    mask = prob_interior > 0.5
    mask = remove_small_holes_jax(mask, area_threshold=64, connectivity=1)
    mask = remove_small_objects_jax(mask, min_size=16, connectivity=1)

    core = (prob_interior - prob_boundary) > th_seed
    core = jnp.logical_and(core, mask)
    core = remove_small_objects_jax(core, min_size=4, connectivity=1)
    seeds = label_components(core, connectivity=2)
    labels = watershed_jax(-prob_interior.astype(jnp.float32), seeds, mask)
    return labels.astype(jnp.int32)
