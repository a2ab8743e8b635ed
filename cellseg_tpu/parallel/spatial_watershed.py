"""Spatially-sharded marker-based watershed (gigapixel distance decode).

Same halo-exchange pattern as the sharded connected components
(parallel/spatial.py): each sweep relaxes the minimax-path
(cost, hops, label) state within the stripe, then absorbs the neighbors'
boundary rows via
ppermute; global convergence via pmax of per-shard change flags. Bit-equal
to ops/watershed.watershed_jax on the same canvas.

`spatial_decode_distance` composes the full KIT-GE decode across the mesh:
smoothing and thresholds (XLA auto-partitions the elementwise work), seed
labeling via the sharded CC, a seed area filter, and the sharded flood.
The seed min-area filter ships a halo sized to the data-dependent
threshold (max(64, floor(0.1·mean_area)+1), capped at the stripe): with
halo ≥ threshold the keep decisions are EXACT (a seam-crossing seed
smaller than the halo is fully visible to every owning block; a larger
one spans ≥ halo pixels from any owned pixel to the ext border, so
keeping it is correct). In the rare threshold > stripe regime the root
block's local decision is flooded over each component
(_root_decision_markers + a flat-elevation watershed), so seeds are kept
or dropped WHOLE — conservative in a band of [stripe, threshold)-area
seam-crossing seeds, never slivered.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.watershed import _BIG, _INF_HOPS, relax_once
from .spatial import AXIS, _filter_local, _perm, spatial_label_components


def spatial_watershed(image, markers, mask, mesh: Mesh,
                      max_iters: int = 4096):
    """Minimax-path watershed over a row-sharded canvas.

    image/markers/mask: (H_pad, W_pad) sharded P(AXIS, None).
    Returns int32 labels with the markers' ids.
    """
    n_dev = mesh.shape[AXIS]
    h_pad, w_pad = image.shape
    stripe = h_pad // n_dev

    def shard_fn(e_s, m_s, k_s):
        e_s = e_s.reshape(stripe, w_pad)
        m_s = m_s.reshape(stripe, w_pad)
        k_s = k_s.reshape(stripe, w_pad)
        e = jnp.where(m_s, e_s.astype(jnp.float32), _BIG)
        seeded = k_s > 0
        cost = jnp.where(seeded, e, _BIG)
        hops = jnp.where(seeded, 0, _INF_HOPS)
        label = jnp.where(seeded, k_s.astype(jnp.int32), 0)

        # 1-row ghosts from the stripe neighbors; labels MUST travel as
        # int32 (global raster root ids exceed 2^24 above 16.7 MP — a
        # float32 detour would alias nearby seeds on gigapixel canvases)
        idx = jax.lax.axis_index(AXIS)

        def with_ghosts(arr, fill):
            top = jax.lax.ppermute(arr[-1:], AXIS, _perm(n_dev, True))
            top = jnp.where(idx == 0, fill, top)
            bot = jax.lax.ppermute(arr[:1], AXIS, _perm(n_dev, False))
            bot = jnp.where(idx == n_dev - 1, fill, bot)
            return jnp.concatenate([top, arr, bot], axis=0)

        # elevation/mask ghosts are loop-invariant: ship them once
        e_e = with_ghosts(e, _BIG)
        m_e = with_ghosts(m_s, False)

        def cond(s):
            _, _, _, ch, it = s
            return jnp.logical_and(ch, it < max_iters)

        def body(s):
            cost, hops, label, _, it = s
            nc, nh, nl = relax_once(
                with_ghosts(cost, _BIG), with_ghosts(hops, _INF_HOPS),
                with_ghosts(label, 0), e_e, m_e)
            new_cost, new_hops, new_label = nc[1:-1], nh[1:-1], nl[1:-1]
            # the cost plane must be part of the convergence check (same
            # argument as ops/watershed.py): a cost-only relaxation this
            # sweep can flip a neighbor's label in the NEXT sweep
            changed = jax.lax.pmax(
                jnp.any(jnp.logical_or(
                    new_label != label,
                    jnp.logical_or(new_hops != hops,
                                   new_cost != cost))), AXIS)
            return new_cost, new_hops, new_label, changed, it + 1

        _, _, label, _, _ = jax.lax.while_loop(
            cond, body, (cost, hops, label, jnp.bool_(True), jnp.int32(0)))
        return jnp.where(m_s, label, 0)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None)),
        out_specs=P(AXIS, None),
        check_vma=False,
    )
    return fn(image, mask, markers)


@jax.jit
def _root_decision_markers(seeds, seed_mask, keep_local):
    """Per-component decision markers for the threshold > stripe seed
    filter: at each component root (the pixel whose global raster index
    is its own label - 1), marker 1 if the root's block kept it locally,
    else 2. Flooding these over the seed components (flat-elevation
    watershed — exactly one marker per component) broadcasts the root
    block's decision, so a component is kept or dropped WHOLE."""
    h, w = seed_mask.shape
    lin = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    is_root = jnp.logical_and(seed_mask, seeds - 1 == lin)
    return jnp.where(is_root,
                     jnp.where(keep_local, 1, 2), 0).astype(jnp.int32)


def spatial_decode_distance(border_pred, cell_pred, mesh: Mesh,
                            th_cell: float = 0.07,
                            th_seed: float = 0.45) -> np.ndarray:
    """Sharded distance decode (KIT-GE semantics) over a padded canvas.

    border_pred/cell_pred: (H_pad, W_pad) float arrays sharded P(AXIS, None)
    with H_pad a multiple of n_dev * 64. Returns host int32 labels.
    """
    from ..decode.distance import _smooth_cell, transform_border
    from ..metrics import relabel_sequential

    n_dev = mesh.shape[AXIS]
    h_pad, w_pad = cell_pred.shape
    stripe = h_pad // n_dev
    if stripe < 64:
        raise ValueError(
            f"stripe {stripe} < 64; pad the canvas so H_pad is a multiple "
            f"of n_dev * 64")

    sharding = NamedSharding(mesh, P(AXIS, None))

    @jax.jit
    def prep(cell, border):
        # σ=0.5 gaussian (shared _smooth_cell: scipy-parity symmetric
        # padding); XLA partitions the conv with automatic halos
        cell_s = _smooth_cell(cell)
        mask = cell_s > th_cell
        seed_mask = (cell_s - transform_border(border)) > th_seed
        return cell_s, mask, seed_mask

    cell_s, mask, seed_mask = prep(cell_pred, border_pred)

    # label seeds globally, compute the mean-area threshold from psums
    seeds = spatial_label_components(seed_mask, mesh)  # global root ids + 1

    @jax.jit
    def seed_stats(seeds, seed_mask):
        n_px = jnp.sum(seed_mask)
        # roots: pixels whose (label-1) equals their own global raster index
        h_, w_ = seed_mask.shape
        lin = (jnp.arange(h_ * w_, dtype=jnp.int32)).reshape(h_, w_)
        is_root = jnp.logical_and(seed_mask, seeds - 1 == lin)
        return n_px, jnp.sum(is_root)

    n_px, n_seeds = seed_stats(seeds, seed_mask)
    mean_area = float(jax.device_get(n_px)) / max(float(jax.device_get(n_seeds)), 1.0)
    min_area = max(0.10 * mean_area, 4.0)

    # halo-local area filter on the seed mask. Exact when the halo can
    # cover the data-dependent threshold (a seam-crossing seed smaller
    # than the halo is fully visible to every owning block; a larger one
    # spans >= halo pixels from any owned pixel to the ext border, so
    # keeping it is correct). When the threshold exceeds the stripe the
    # local views can DISAGREE (one block sees the full small seed, its
    # neighbor only an edge-touching sliver) — there the root block's
    # decision is flooded over each component so the filter stays
    # whole-component consistent (conservative, never slivered).
    threshold = int(np.floor(min_area)) + 1
    halo = min(max(64, threshold), stripe)
    exact = halo >= threshold

    def filter_fn(sm):
        sm = sm.reshape(stripe, w_pad)

        def with_halo(m):
            top = jax.lax.ppermute(m[-halo:], AXIS, _perm(n_dev, True))
            bot = jax.lax.ppermute(m[:halo], AXIS, _perm(n_dev, False))
            return jnp.concatenate([top, m, bot], axis=0)

        # keep if area > min_area ⇔ integer area >= floor(min_area)+1
        return _filter_local(with_halo(sm), threshold, 2, halo, stripe)

    seed_mask2 = shard_map(
        filter_fn, mesh=mesh, in_specs=(P(AXIS, None),),
        out_specs=P(AXIS, None), check_vma=False,
    )(seed_mask)
    if exact:
        # the filter drops whole components, so surviving pixels keep
        # their global root ids — no second global CC needed (same
        # optimization as the single-device _seeds_and_mask)
        seeds2 = jnp.where(seed_mask2, seeds, 0)
    else:
        markers = _root_decision_markers(seeds, seed_mask, seed_mask2)
        dec = spatial_watershed(jnp.zeros_like(cell_s), markers,
                                seed_mask, mesh)
        seeds2 = jnp.where(dec == 1, seeds, 0)

    labels = spatial_watershed(-cell_s, seeds2, mask, mesh)
    host = np.asarray(jax.device_get(labels))
    return relabel_sequential(host)


def spatial_watershed_2d(image, markers, mask, mesh: Mesh,
                         max_iters: int = 4096):
    """Minimax-path watershed over a 2-D (rows × cols) block-sharded
    canvas (parallel/spatial2d.py mesh). Same (cost, hops, label)
    lexicographic relaxation as spatial_watershed, with a two-phase 1-px
    boundary exchange in both axes per sweep (corners ride the second
    hop). Bit-equal to ops/watershed.watershed_jax on the same canvas.
    """
    from .spatial2d import AXX, AXY, _with_halo2d

    ny, nx = mesh.shape[AXY], mesh.shape[AXX]
    h_pad, w_pad = image.shape
    stripe_y, stripe_x = h_pad // ny, w_pad // nx

    def shard_fn(e_s, m_s, k_s):
        e_s = e_s.reshape(stripe_y, stripe_x)
        m_s = m_s.reshape(stripe_y, stripe_x)
        k_s = k_s.reshape(stripe_y, stripe_x)
        e = jnp.where(m_s, e_s.astype(jnp.float32), _BIG)
        seeded = k_s > 0
        cost = jnp.where(seeded, e, _BIG)
        hops = jnp.where(seeded, 0, _INF_HOPS)
        label = jnp.where(seeded, k_s.astype(jnp.int32), 0)

        # elevation/mask ghosts are loop-invariant: ship them once
        e_e = _with_halo2d(e, 1, 1, ny, nx, _BIG)
        m_e = _with_halo2d(m_s, 1, 1, ny, nx, False)

        def cond(s):
            _, _, _, ch, it = s
            return jnp.logical_and(ch, it < max_iters)

        def body(s):
            cost, hops, label, _, it = s
            nc, nh, nl = relax_once(
                _with_halo2d(cost, 1, 1, ny, nx, _BIG),
                _with_halo2d(hops, 1, 1, ny, nx, _INF_HOPS),
                _with_halo2d(label, 1, 1, ny, nx, 0), e_e, m_e)
            new_cost = nc[1:-1, 1:-1]
            new_hops = nh[1:-1, 1:-1]
            new_label = nl[1:-1, 1:-1]
            changed = jax.lax.pmax(jax.lax.pmax(
                jnp.any(jnp.logical_or(
                    new_label != label,
                    jnp.logical_or(new_hops != hops,
                                   new_cost != cost))), AXY), AXX)
            return new_cost, new_hops, new_label, changed, it + 1

        _, _, label, _, _ = jax.lax.while_loop(
            cond, body, (cost, hops, label, jnp.bool_(True), jnp.int32(0)))
        return jnp.where(m_s, label, 0)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXY, AXX), P(AXY, AXX), P(AXY, AXX)),
        out_specs=P(AXY, AXX),
        check_vma=False,
    )
    return fn(image, mask, markers)


def spatial_decode_distance_2d(border_pred, cell_pred, mesh: Mesh,
                               th_cell: float = 0.07,
                               th_seed: float = 0.45) -> np.ndarray:
    """Sharded KIT-GE distance decode over a 2-D block mesh: the
    spatial_decode_distance pipeline (smooth → thresholds → global seed
    CC → halo-local seed area filter → minimax flood) with every stage on
    the (sy, sx) mesh. border/cell: (H_pad, W_pad) sharded P(AXY, AXX)
    with stripes that are multiples of 64. Returns host int32 labels."""
    from ..decode.distance import _smooth_cell, transform_border
    from ..metrics import relabel_sequential
    from .spatial2d import (AXX, AXY, _filter_local2d, _with_halo2d,
                            spatial_label_components_2d)

    ny, nx = mesh.shape[AXY], mesh.shape[AXX]
    h_pad, w_pad = cell_pred.shape
    stripe_y, stripe_x = h_pad // ny, w_pad // nx
    if stripe_y < 64 or stripe_x < 64:
        raise ValueError(
            f"block ({stripe_y},{stripe_x}) < 64; pad with "
            f"pad_for_mesh2d(min_stripe=64)")

    @jax.jit
    def prep(cell, border):
        cell_s = _smooth_cell(cell)
        mask = cell_s > th_cell
        seed_mask = (cell_s - transform_border(border)) > th_seed
        return cell_s, mask, seed_mask

    cell_s, mask, seed_mask = prep(cell_pred, border_pred)

    seeds = spatial_label_components_2d(seed_mask, mesh)

    @jax.jit
    def seed_stats(seeds, seed_mask):
        n_px = jnp.sum(seed_mask)
        h_, w_ = seed_mask.shape
        lin = (jnp.arange(h_ * w_, dtype=jnp.int32)).reshape(h_, w_)
        is_root = jnp.logical_and(seed_mask, seeds - 1 == lin)
        return n_px, jnp.sum(is_root)

    n_px, n_seeds = seed_stats(seeds, seed_mask)
    mean_area = (float(jax.device_get(n_px))
                 / max(float(jax.device_get(n_seeds)), 1.0))
    min_area = max(0.10 * mean_area, 4.0)

    # tiered exactness — see spatial_decode_distance
    threshold = int(np.floor(min_area)) + 1
    halo = min(max(64, threshold), stripe_y, stripe_x)
    exact = halo >= threshold

    def filter_fn(sm):
        sm = sm.reshape(stripe_y, stripe_x)
        ext = _with_halo2d(sm, halo, halo, ny, nx, fill=False)
        return _filter_local2d(ext, threshold, 2,
                               halo, halo, stripe_y, stripe_x)

    seed_mask2 = shard_map(
        filter_fn, mesh=mesh, in_specs=(P(AXY, AXX),),
        out_specs=P(AXY, AXX), check_vma=False,
    )(seed_mask)
    if exact:
        # whole components survive the filter → reuse the global root ids
        seeds2 = jnp.where(seed_mask2, seeds, 0)
    else:
        markers = _root_decision_markers(seeds, seed_mask, seed_mask2)
        dec = spatial_watershed_2d(jnp.zeros_like(cell_s), markers,
                                   seed_mask, mesh)
        seeds2 = jnp.where(dec == 1, seeds, 0)

    labels = spatial_watershed_2d(-cell_s, seeds2, mask, mesh)
    host = np.asarray(jax.device_get(labels))
    return relabel_sequential(host)
