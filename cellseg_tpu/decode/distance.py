"""Distance-prediction instance decoding (KIT-GE capability).

Semantics-parity rebuild of `distance_postprocessing`
(KIT-GE segmentation/inference/postprocessing.py:46-185, 2D path):

  1. Gaussian-smooth the cell prediction (σ=0.5), clip borders to [0,1]
  2. mask = cell_pred > th_cell
  3. seeds = label(cell_pred − tan(border²) > th_seed), with sub-mean-area
     seed removal (min area = max(0.1·mean_area, 4))
  4. decay th_seed by 0.1 until at least one seed exists
  5. marker-based watershed on −cell_pred within the mask

The main path (`decode_distance`) runs fully on device: smoothing, seed
labeling (CC kernel), area filtering, and the iterative flood watershed.
The seed-decay rescue loop runs as a host-orchestrated retry of the same
jitted program (it triggers only on near-empty predictions).
`foi_correction` reproduces postprocessing.py:12-43.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.watershed import watershed_jax
from ..pipeline.augment import separable_gaussian_blur


@functools.partial(jax.jit, static_argnames=())
def _smooth_cell(cell_pred: jax.Array) -> jax.Array:
    # symmetric padding = scipy gaussian_filter's default 'reflect'
    # (edge repeated); jnp 'reflect' is scipy's 'mirror' and diverges in
    # the border band (postprocessing.py:68 parity)
    x = cell_pred.astype(jnp.float32)[..., None]
    return separable_gaussian_blur(x, jnp.float32(0.5), jnp.float32(0.5),
                                   radius=2, pad_mode="symmetric")[..., 0]


def transform_border(border_pred: jax.Array) -> jax.Array:
    """The decode's border sharpening: tan(clip(b)²) with a 0.05 floor
    (reference postprocessing.py:71-74). THE single definition — the
    sharded decodes and --save_raw_pred dumps must stay in sync with the
    seed computation."""
    border = jnp.clip(border_pred.astype(jnp.float32), 0, 1)
    borders = jnp.tan(border ** 2)
    borders = jnp.where(borders < 0.05, 0.0, borders)
    return jnp.clip(borders, 0, 1)


@functools.partial(jax.jit, static_argnames=("rescue",))
def _seeds_and_mask(cell_pred: jax.Array, border_pred: jax.Array,
                    th_cell: jax.Array, th_seed: jax.Array,
                    rescue: bool = False):
    """Smoothed prediction → (mask, seed labels) with area filtering.

    rescue=False (first pass): remove seeds with area <= max(0.1·mean, 4)
    (reference postprocessing.py:87-101). rescue=True (seed-decay retries):
    remove only area <= 4 seeds, matching the reference's decay loop
    (postprocessing.py:104-112) — applying the full mean-area filter there
    can kill the very seeds the rescue exists to recover on near-empty
    predictions.
    """
    cell = _smooth_cell(cell_pred)
    mask = cell > th_cell
    cleaned = cell - transform_border(border_pred)
    seed_mask = cleaned > th_seed

    # Two CC propagations (roots, then dense sequential ids — the id
    # flood runs BEFORE the area filter so the ids double as dense ranks)
    # and zero sorts on the common path: per-rank areas are an exact MXU
    # one-hot histogram and the area filter + final renumbering are MXU
    # table lookups (ops/rank_areas.py) — replacing the two full-image
    # sort passes of component_areas_by_sort (~9 ms at 4.2 MP). Above
    # 65536 seed components (never in practice — seeds are cells) the
    # bit-identical sort path takes over via lax.cond.
    from ..ops.cc import (
        _root_labels,
        component_areas_by_sort,
        sequential_from_roots,
    )
    from ..ops.rank_areas import (
        _RANK_BINS,
        _mxu_dtype,
        counts_by_rank,
        rank_value_lookup,
    )

    roots = _root_labels(seed_mask, connectivity=2)
    dense = sequential_from_roots(roots, seed_mask, connectivity=2)
    k_total = jnp.max(dense)

    def _min_area(area_sum, num_seeds):
        if rescue:
            return jnp.float32(4.0)
        mean_area = area_sum / jnp.maximum(num_seeds, 1).astype(jnp.float32)
        return jnp.maximum(0.10 * mean_area, 4.0)

    area_sum = jnp.sum(seed_mask.astype(jnp.float32))

    def hist_path(dense, seed_mask, bins=_RANK_BINS, side=256):
        dense0 = jnp.clip(dense - 1, 0, bins - 1)
        counts = counts_by_rank(dense0, seed_mask, side)
        min_area = _min_area(area_sum, k_total)
        keep = counts.astype(jnp.float32) > min_area
        seq_table = jnp.cumsum(keep.astype(jnp.int32))
        seq_table = jnp.where(keep, seq_table, 0)
        seeds2 = rank_value_lookup(dense0, seq_table, side)
        return jnp.where(seed_mask, seeds2, 0)

    def sort_path(dense, seed_mask):
        area_px = component_areas_by_sort(
            roots.ravel(), seed_mask.ravel()).reshape(seed_mask.shape)
        min_area = _min_area(area_sum, k_total)
        seed_mask2 = jnp.logical_and(
            seed_mask, area_px.astype(jnp.float32) > min_area)
        return sequential_from_roots(
            jnp.where(seed_mask2, roots, jnp.int32(2**31 - 1)), seed_mask2,
            connectivity=2)

    if _mxu_dtype() is not jnp.bfloat16:
        seeds2 = sort_path(dense, seed_mask)
    else:
        # tiered by runtime seed-component count (rank_areas module doc)
        from ..ops.rank_areas import _BINS_SMALL, _SIDE_SMALL

        seeds2 = jax.lax.cond(
            k_total <= _BINS_SMALL,
            lambda d, sm: hist_path(d, sm, _BINS_SMALL, _SIDE_SMALL),
            lambda d, sm: jax.lax.cond(k_total <= _RANK_BINS, hist_path,
                                       sort_path, d, sm),
            dense, seed_mask)
    return cell, mask, seeds2


@jax.jit
def _flood(cell: jax.Array, seeds: jax.Array, mask: jax.Array):
    return watershed_jax(-cell, seeds, mask)


def decode_distance(border_pred: np.ndarray, cell_pred: np.ndarray,
                    th_cell: float = 0.07, th_seed: float = 0.45):
    """Full distance decode; returns int32 instance labels (host array)."""
    border_pred = jnp.asarray(border_pred)
    cell_pred = jnp.asarray(cell_pred)
    th = float(th_seed)
    cell, mask, seeds = _seeds_and_mask(
        cell_pred, border_pred, jnp.float32(th_cell), jnp.float32(th)
    )
    # seed-decay rescue: guarantee at least one cell (reference :104-112);
    # retries only drop area<=4 seeds, not the mean-area-scaled filter
    while int(jax.device_get(jnp.max(seeds))) == 0 and th > 0.05:
        th -= 0.1
        cell, mask, seeds = _seeds_and_mask(
            cell_pred, border_pred, jnp.float32(th_cell), jnp.float32(th),
            rescue=True,
        )
    labels = _flood(cell, seeds, mask)
    return np.asarray(jax.device_get(labels)).astype(np.int32)


def foi_correction(mask: np.ndarray, cell_type: str) -> np.ndarray:
    """Field-of-interest correction (reference postprocessing.py:12-43)."""
    if cell_type in ['DIC-C2DH-HeLa', 'Fluo-C2DL-Huh7', 'Fluo-C2DL-MSC',
                     'Fluo-C3DH-H157', 'Fluo-N2DH-GOWT1', 'Fluo-N3DH-CE',
                     'Fluo-N3DH-CHO', 'PhC-C2DH-U373']:
        E = 50
    elif cell_type in ['BF-C2DL-HSC', 'BF-C2DL-MuSC', 'Fluo-C3DL-MDA231',
                       'Fluo-N2DL-HeLa', 'PhC-C2DL-PSC']:
        E = 25
    else:
        E = 0
    if E == 0:
        return mask
    if mask.ndim == 2:
        foi = mask[E:mask.shape[0] - E, E:mask.shape[1] - E]
    else:
        foi = mask[:, E:mask.shape[1] - E, E:mask.shape[2] - E]
    ids_foi = set(np.unique(foi).tolist()) - {0}
    ids_all = set(np.unique(mask).tolist()) - {0}
    for i in ids_all - ids_foi:
        mask[mask == i] = 0
    return mask
