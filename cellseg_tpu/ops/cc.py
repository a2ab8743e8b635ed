"""On-device connected-components labeling (XLA, static shapes).

The reference decodes instances on host with skimage.measure.label /
remove_small_objects / remove_small_holes (baseline/predict.py:113), a
Cython hot path with a full-image device→host round trip. Here labeling
runs on-device as the classic GPU label-equivalence scheme (iterative
min-neighbor hooking + pointer-jumping compression), converging in
O(log N) sweeps of pure vector ops + gathers — no host transfer.

Label order parity: each component's root is its minimum linear (raster)
index, so ranking roots by raster position reproduces scipy/skimage's
first-encounter label order exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.int32(2**31 - 1)

# neighbor shifts
_SHIFTS_4 = ((-1, 0), (1, 0), (0, -1), (0, 1))
_SHIFTS_8 = _SHIFTS_4 + ((-1, -1), (-1, 1), (1, -1), (1, 1))


def _neighbor_min(lab: jax.Array, connectivity: int) -> jax.Array:
    """Min label over the (masked) neighborhood; INF-padded borders."""
    shifts = _SHIFTS_8 if connectivity == 2 else _SHIFTS_4
    h, w = lab.shape
    out = lab
    padded = jnp.pad(lab, 1, constant_values=_INF)
    for dy, dx in shifts:
        nb = jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))
        out = jnp.minimum(out, nb)
    return out


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def label_components(mask: jax.Array, connectivity: int = 2,
                     max_iters: int = 64) -> jax.Array:
    """Label connected components of a bool mask, skimage-order 1..K.

    connectivity: 1 → 4-neighborhood, 2 → 8-neighborhood
    (skimage.measure.label 2D default is 2).

    Algorithm: Shiloach–Vishkin-style union-find on the pixel grid. Each
    sweep (a) takes the min label over each pixel's neighborhood, (b)
    scatter-mins that value into the pixel's current ROOT (so whole trees
    hook onto smaller roots in one step), and (c) compresses paths with
    pointer jumping. Converges in O(log n) sweeps even on serpentine /
    percolation-threshold masks.
    """
    h, w = mask.shape
    n = h * w
    lin = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    lab = jnp.where(mask, lin, _INF)
    flat_mask = mask.ravel()

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        lab, _, it = state
        # (a) best (min) label visible in each pixel's neighborhood
        nbr = jnp.where(mask, _neighbor_min(lab, connectivity), _INF).ravel()
        flat = lab.ravel()
        safe = jnp.where(flat == _INF, 0, flat)
        # (b) hook: parent[root_of(p)] <- min(…, nbr[p]); parent table is
        # pixel-indexed because labels are pixel ids. Background scatters
        # INF, a no-op under min.
        parent = jnp.full((n,), _INF, jnp.int32).at[safe].min(
            jnp.where(flat_mask, nbr, _INF)
        )
        parent = jnp.where(flat_mask, jnp.minimum(parent, flat), parent)
        # ensure entries for pixels that are nobody's label keep identity
        parent = jnp.where(parent == _INF,
                           jnp.where(flat_mask, jnp.arange(n, dtype=jnp.int32), _INF),
                           parent)
        # (c) compress: parent <- parent[parent], twice
        for _ in range(2):
            psafe = jnp.where(parent == _INF, 0, parent)
            parent = jnp.where(parent == _INF, _INF, parent[psafe])
        new_flat = jnp.where(flat_mask, parent[safe], _INF)
        new_lab = new_flat.reshape(h, w)
        changed = jnp.any(new_lab != lab)
        return new_lab, changed, it + 1

    lab, _, _ = jax.lax.while_loop(
        cond, body, (lab, jnp.bool_(True), jnp.int32(0))
    )

    # sequential ids in raster order of component roots
    flat = lab.ravel()
    is_root = flat == jnp.arange(n, dtype=jnp.int32)
    is_root = jnp.logical_and(is_root, mask.ravel())
    seq = jnp.cumsum(is_root.astype(jnp.int32))
    safe = jnp.where(flat == _INF, 0, flat)
    out = jnp.where(mask.ravel(), seq[safe], 0)
    return out.reshape(h, w)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def component_areas_map(mask: jax.Array, connectivity: int = 1):
    """Per-pixel component area for a bool mask (0 on background).

    Returns (labels, area_map). Scatter-add over root ids runs on device.
    """
    lab = label_components(mask, connectivity=connectivity)
    n = mask.shape[0] * mask.shape[1]
    flat = lab.ravel()
    areas = jnp.zeros((n + 1,), jnp.int32).at[flat].add(1)
    area_map = areas[flat].reshape(mask.shape)
    return lab, jnp.where(mask, area_map, 0)


@functools.partial(jax.jit, static_argnames=("min_size", "connectivity"))
def remove_small_objects_jax(mask: jax.Array, min_size: int = 16,
                             connectivity: int = 1) -> jax.Array:
    """Drop components with area < min_size (skimage semantics, on device)."""
    _, area = component_areas_map(mask, connectivity)
    return jnp.logical_and(mask, area >= min_size)


@functools.partial(jax.jit, static_argnames=("area_threshold", "connectivity"))
def remove_small_holes_jax(mask: jax.Array, area_threshold: int = 64,
                           connectivity: int = 1) -> jax.Array:
    """Fill background components with area < area_threshold (on device)."""
    inv = jnp.logical_not(mask)
    _, area = component_areas_map(inv, connectivity)
    fill = jnp.logical_and(inv, area < area_threshold)
    return jnp.logical_or(mask, fill)
