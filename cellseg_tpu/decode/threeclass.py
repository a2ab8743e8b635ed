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

    Fused region decode: ONE region propagation (ops/cc.py:region_roots)
    labels the 4-conn components of the mask AND of its complement
    simultaneously — the hole-fill pass (background components < 64 px)
    and the object pass share it instead of each paying a full-image
    propagation. After filling, object components are merged across the
    filled holes by a warm-started propagation (constituent roots are
    already component-min indices, so only the ≤63 px hole crossings need
    resolving — a couple of scan iterations), and the surviving 4-conn
    roots seed the final 8-conn labeling exactly as before. Bit-parity
    with the reference chain remove_small_holes(64) → remove_small_objects
    (16) → label(8-conn) is pinned by tests vs the scipy host golden.
    """
    import jax.numpy as jnp

    from ..ops.cc import (
        _INF,
        _propagate,
        region_roots,
        sequential_from_ranks_table,
    )
    from ..ops.rank_areas import dense_region_ranks, small_mask_guarded

    mask = prob_interior > 0.5
    roots = region_roots(mask)
    # dense ranks make the area filters sort-free: per-rank pixel counts
    # are an exact MXU one-hot histogram instead of two full-image sorts
    # (ops/rank_areas.py; guarded sort fallback above 65536 components)
    dense, r_plane, k_total = dense_region_ranks(
        roots, mask.astype(jnp.int32))

    # hole fill: background 4-conn components with area < 64
    inv = jnp.logical_not(mask)
    small_bg = small_mask_guarded(dense, k_total, inv, 64)
    filled = jnp.logical_or(mask, small_bg)

    # merge object components across the filled holes: every constituent
    # (object comps and filled background comps) carries its own rank, and
    # ranks are monotone in root index, so min-propagation converges to
    # the merged component's min-root rank in a few iterations (holes are
    # < 64 px wide)
    merged = _propagate(jnp.where(filled, dense, _INF), filled,
                        connectivity=1, max_iters=1024)

    # small-object removal on the filled mask (areas include filled holes,
    # matching skimage's ordering)
    small = small_mask_guarded(merged, k_total, filled, 16)
    mask2 = jnp.logical_and(filled, ~small)

    # final 8-conn labeling seeded by the surviving merged ranks
    lab = _propagate(jnp.where(mask2, merged, _INF), mask2,
                     connectivity=2, max_iters=1024)
    return sequential_from_ranks_table(lab, r_plane, roots, mask2, k_total,
                                       connectivity=2)


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
