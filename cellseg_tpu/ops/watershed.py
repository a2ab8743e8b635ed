"""Marker-based watershed (on-device XLA + host golden).

The reference decodes distance predictions with skimage's priority-flood
watershed (KIT-GE segmentation/inference/postprocessing.py:144:
watershed(image=-cell_pred, markers, mask)). A priority queue is inherently
sequential, so the TPU version solves the equivalent shortest-path-forest
problem instead: each masked pixel is assigned to the marker with the
minimax path cost (the lowest "pass height" along the path, ties broken by
marker id). Flooding is iterative 8-neighbor relaxation — pure shift/min
vector ops, the same cost profile as the CC kernel (~0.1 ms per sweep at
4 MP), converging in O(basin diameter) sweeps.

`watershed_host` is the sequential golden (heapq priority flood with
skimage's (value, age) ordering) used for parity tests.
"""

from __future__ import annotations

import functools
import heapq

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 3.0e38
_SHIFTS_8 = ((-1, 0), (1, 0), (0, -1), (0, 1),
             (-1, -1), (-1, 1), (1, -1), (1, 1))


def _shift2(arr, dy, dx, fill):
    h, w = arr.shape
    padded = jnp.pad(arr, 1, constant_values=fill)
    return jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))


_INF_HOPS = jnp.int32(2**31 - 1)


def relax_once(cost, hops, label, e, mask):
    """One 8-neighbor lexicographic relaxation sweep (the while-loop body
    of watershed_jax, exposed for the Pallas fused kernel's parity
    tests)."""
    new_cost, new_hops, new_label = cost, hops, label
    for dy, dx in _SHIFTS_8:
        nc = _shift2(cost, dy, dx, _BIG)
        nh = _shift2(hops, dy, dx, _INF_HOPS)
        nl = _shift2(label, dy, dx, 0)
        cand = jnp.maximum(nc, e)  # minimax path cost through neighbor
        # hops count steps AT the path's current max level: a climb to a
        # new max (e > nc) resets the count — in skimage's priority flood
        # every pixel strictly below the flood level pops before the next
        # level-e entry, so only the steps at the max level delay arrival
        # (measured on real trained outputs: 0.67 → 0.87 pixel agreement
        # with the sequential golden vs the plain geodesic count)
        cand_h = jnp.where(nh == _INF_HOPS, _INF_HOPS,
                           jnp.where(e > nc, 1, nh + 1))
        cost_eq = cand == new_cost
        better = jnp.logical_or(
            cand < new_cost,
            jnp.logical_and(cost_eq, jnp.logical_or(
                cand_h < new_hops,
                jnp.logical_and(cand_h == new_hops,
                                jnp.logical_and(nl > 0,
                                                nl < new_label)))),
        )
        better = jnp.logical_and(better, jnp.logical_and(mask, nl > 0))
        new_cost = jnp.where(better, cand, new_cost)
        new_hops = jnp.where(better, cand_h, new_hops)
        new_label = jnp.where(better, nl, new_label)
    return new_cost, new_hops, new_label


@functools.partial(jax.jit, static_argnames=("max_iters",))
def watershed_jax(image: jax.Array, markers: jax.Array, mask: jax.Array,
                  max_iters: int = 512):
    """Minimax-path watershed with first-arrival plateau splitting.

    image: (H, W) elevation (lower = flooded first, e.g. -cell_pred)
    markers: (H, W) int32 seed labels (0 = none)
    mask: (H, W) bool region to label
    Returns (H, W) int32 labels.

    Path cost is lexicographic (minimax elevation, steps at that maximum,
    marker id). The second key models skimage's (value, insertion-age)
    heap order: in a priority flood every queued pixel strictly below the
    current level pops before the next entry AT the level, so a path's
    arrival is delayed only by its steps at its maximum elevation — the
    count resets whenever the path climbs to a new max. On a flat or
    quantized region (bf16 outputs are full of these) this reduces to the
    geodesic first-arrival rule; across mixed real terrain it tracks the
    sequential golden much closer than a whole-path geodesic count
    (0.87 vs 0.67 pixel agreement on a trained model's dense real-data
    output). Exact-tie residue (equal cost AND equal count) falls back to
    smallest marker id — a measure-zero frontier one pixel wide.
    """
    e = jnp.where(mask, image.astype(jnp.float32), _BIG)
    seeded = markers > 0
    cost = jnp.where(seeded, e, _BIG)
    hops = jnp.where(seeded, 0, _INF_HOPS)
    label = jnp.where(seeded, markers.astype(jnp.int32), 0)

    from .pallas.ws_local import stripe_ws_converge, ws_local_supported
    from .pallas.ws_sweeps import fused_ws_sweeps, ws_sweeps_config

    cfg = ws_sweeps_config(*image.shape)

    def cond(state):
        _, _, _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    if ws_local_supported(*image.shape):
        # block-local two-phase fast path (ops/pallas/ws_local.py): each
        # row stripe converges to its local fixed point in VMEM, then one
        # global relax_once moves fronts across stripe boundaries and is
        # the convergence certificate (its identity at the outer fixed
        # point is exactly the plain loop's exit condition). Outer
        # iterations ≈ stripes a basin spans, not basin diameter.
        def body(state):
            cost, hops, label, _, it = state
            nc, nh, nl = stripe_ws_converge(e, mask, cost, hops, label)
            nc, nh, nl = relax_once(nc, nh, nl, e, mask)
            changed = jnp.any(
                jnp.logical_or(nl != label,
                               jnp.logical_or(nh != hops, nc != cost)))
            return nc, nh, nl, changed, it + 1
    elif cfg is not None:
        # k relaxation sweeps per HBM round trip (Pallas VMEM kernel) —
        # bit-identical to k plain sweeps; convergence checked per block
        stripe, k = cfg

        def body(state):
            cost, hops, label, _, it = state
            nc, nh, nl = fused_ws_sweeps(e, mask, cost, hops, label,
                                         k=k, stripe=stripe)
            changed = jnp.any(
                jnp.logical_or(nl != label,
                               jnp.logical_or(nh != hops, nc != cost)))
            return nc, nh, nl, changed, it + k
    else:
        def body(state):
            cost, hops, label, _, it = state
            new_cost, new_hops, new_label = relax_once(
                cost, hops, label, e, mask)
            changed = jnp.any(jnp.logical_or(
                new_label != label,
                jnp.logical_or(new_hops != hops, new_cost != cost)))
            return new_cost, new_hops, new_label, changed, it + 1

    _, _, label, _, _ = jax.lax.while_loop(
        cond, body, (cost, hops, label, jnp.bool_(True), jnp.int32(0))
    )
    return jnp.where(mask, label, 0)


def watershed_host(image: np.ndarray, markers: np.ndarray,
                   mask: np.ndarray) -> np.ndarray:
    """Sequential priority-flood watershed (skimage-order golden)."""
    h, w = image.shape
    labels = np.where(mask, markers.astype(np.int64), 0)
    heap: list[tuple[float, int, int, int]] = []
    age = 0
    ys, xs = np.nonzero((markers > 0) & mask)
    for y, x in zip(ys, xs):
        heapq.heappush(heap, (float(image[y, x]), age, int(y), int(x)))
        age += 1
    in_queue = np.zeros((h, w), dtype=bool)
    in_queue[ys, xs] = True
    while heap:
        _, _, y, x = heapq.heappop(heap)
        lab = labels[y, x]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                ny, nx = y + dy, x + dx
                if not (0 <= ny < h and 0 <= nx < w):
                    continue
                if not mask[ny, nx] or labels[ny, nx] or in_queue[ny, nx]:
                    continue
                labels[ny, nx] = lab
                in_queue[ny, nx] = True
                heapq.heappush(
                    heap, (float(image[ny, nx]), age, ny, nx)
                )
                age += 1
    return labels
