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
The seed min-area filter uses a 64-px halo: seeds larger than the halo that
also cross a stripe boundary are conservatively kept (they exceed any
plausible 0.1×mean-area threshold in practice); everything else is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .spatial import AXIS, _filter_local, _perm, spatial_label_components

_BIG = 3.0e38
_INF_HOPS = jnp.int32(2**31 - 1)
_SHIFTS_8 = ((-1, 0), (1, 0), (0, -1), (0, 1),
             (-1, -1), (-1, 1), (1, -1), (1, 1))


def _shift2(arr, dy, dx, fill):
    h, w = arr.shape
    padded = jnp.pad(arr, 1, constant_values=fill)
    return jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))


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

        def cond(s):
            _, _, _, ch, it = s
            return jnp.logical_and(ch, it < max_iters)

        def body(s):
            cost, hops, label, _, it = s
            # build 1-row ghosts from neighbors
            idx = jax.lax.axis_index(AXIS)

            def with_ghosts(arr, fill):
                top = jax.lax.ppermute(arr[-1:], AXIS, _perm(n_dev, True))
                top = jnp.where(idx == 0, fill, top)
                bot = jax.lax.ppermute(arr[:1], AXIS, _perm(n_dev, False))
                bot = jnp.where(idx == n_dev - 1, fill, bot)
                return jnp.concatenate([top, arr, bot], axis=0)

            cost_e = with_ghosts(cost, _BIG)
            hops_e = with_ghosts(hops, _INF_HOPS)
            label_e = with_ghosts(label.astype(jnp.float32), 0.0)
            label_e = label_e.astype(jnp.int32)
            new_cost, new_hops, new_label = cost, hops, label
            for dy, dx in _SHIFTS_8:
                nc = _shift2(cost_e, dy, dx, _BIG)[1:-1]
                nh = _shift2(hops_e, dy, dx, _INF_HOPS)[1:-1]
                nl = _shift2(label_e, dy, dx, 0)[1:-1]
                cand = jnp.maximum(nc, e)
                cand_h = jnp.where(nh == _INF_HOPS, _INF_HOPS, nh + 1)
                cost_eq = cand == new_cost
                better = jnp.logical_or(
                    cand < new_cost,
                    jnp.logical_and(cost_eq, jnp.logical_or(
                        cand_h < new_hops,
                        jnp.logical_and(
                            cand_h == new_hops,
                            jnp.logical_and(nl > 0, nl < new_label)))),
                )
                better = jnp.logical_and(better,
                                         jnp.logical_and(m_s, nl > 0))
                new_cost = jnp.where(better, cand, new_cost)
                new_hops = jnp.where(better, cand_h, new_hops)
                new_label = jnp.where(better, nl, new_label)
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


def spatial_decode_distance(border_pred, cell_pred, mesh: Mesh,
                            th_cell: float = 0.07,
                            th_seed: float = 0.45) -> np.ndarray:
    """Sharded distance decode (KIT-GE semantics) over a padded canvas.

    border_pred/cell_pred: (H_pad, W_pad) float arrays sharded P(AXIS, None)
    with H_pad a multiple of n_dev * 64. Returns host int32 labels.
    """
    from ..metrics import relabel_sequential
    from ..pipeline.augment import separable_gaussian_blur

    n_dev = mesh.shape[AXIS]
    h_pad, w_pad = cell_pred.shape
    stripe = h_pad // n_dev
    halo = 64

    sharding = NamedSharding(mesh, P(AXIS, None))

    @jax.jit
    def prep(cell, border):
        # σ=0.5 gaussian: XLA partitions the conv with automatic halos
        cell_s = separable_gaussian_blur(
            cell.astype(jnp.float32)[..., None], jnp.float32(0.5),
            jnp.float32(0.5), radius=2)[..., 0]
        borders = jnp.tan(jnp.clip(border.astype(jnp.float32), 0, 1) ** 2)
        borders = jnp.clip(jnp.where(borders < 0.05, 0.0, borders), 0, 1)
        mask = cell_s > th_cell
        seed_mask = (cell_s - borders) > th_seed
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

    # halo-local area filter on the seed mask (exact for seeds smaller than
    # the halo; larger seam-crossing seeds are conservatively kept)
    def filter_fn(sm):
        sm = sm.reshape(stripe, w_pad)

        def with_halo(m):
            top = jax.lax.ppermute(m[-halo:], AXIS, _perm(n_dev, True))
            bot = jax.lax.ppermute(m[:halo], AXIS, _perm(n_dev, False))
            return jnp.concatenate([top, m, bot], axis=0)

        # keep if area > min_area ⇔ integer area >= floor(min_area)+1
        return _filter_local(with_halo(sm), int(np.floor(min_area)) + 1, 2,
                             halo, stripe)

    seed_mask2 = shard_map(
        filter_fn, mesh=mesh, in_specs=(P(AXIS, None),),
        out_specs=P(AXIS, None), check_vma=False,
    )(seed_mask)
    seeds2 = spatial_label_components(seed_mask2, mesh)

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

        def cond(s):
            _, _, _, ch, it = s
            return jnp.logical_and(ch, it < max_iters)

        def body(s):
            cost, hops, label, _, it = s
            cost_e = _with_halo2d(cost, 1, 1, ny, nx, _BIG)
            hops_e = _with_halo2d(hops, 1, 1, ny, nx, _INF_HOPS)
            label_e = _with_halo2d(label, 1, 1, ny, nx, 0)
            new_cost, new_hops, new_label = cost, hops, label
            for dy, dx in _SHIFTS_8:
                nc = _shift2(cost_e, dy, dx, _BIG)[1:-1, 1:-1]
                nh = _shift2(hops_e, dy, dx, _INF_HOPS)[1:-1, 1:-1]
                nl = _shift2(label_e, dy, dx, 0)[1:-1, 1:-1]
                cand = jnp.maximum(nc, e)
                cand_h = jnp.where(nh == _INF_HOPS, _INF_HOPS, nh + 1)
                cost_eq = cand == new_cost
                better = jnp.logical_or(
                    cand < new_cost,
                    jnp.logical_and(cost_eq, jnp.logical_or(
                        cand_h < new_hops,
                        jnp.logical_and(
                            cand_h == new_hops,
                            jnp.logical_and(nl > 0, nl < new_label)))),
                )
                better = jnp.logical_and(better,
                                         jnp.logical_and(m_s, nl > 0))
                new_cost = jnp.where(better, cand, new_cost)
                new_hops = jnp.where(better, cand_h, new_hops)
                new_label = jnp.where(better, nl, new_label)
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
    from ..metrics import relabel_sequential
    from ..pipeline.augment import separable_gaussian_blur
    from .spatial2d import (AXX, AXY, _filter_local2d, _with_halo2d,
                            spatial_label_components_2d)

    ny, nx = mesh.shape[AXY], mesh.shape[AXX]
    h_pad, w_pad = cell_pred.shape
    stripe_y, stripe_x = h_pad // ny, w_pad // nx
    halo = 64

    @jax.jit
    def prep(cell, border):
        cell_s = separable_gaussian_blur(
            cell.astype(jnp.float32)[..., None], jnp.float32(0.5),
            jnp.float32(0.5), radius=2)[..., 0]
        borders = jnp.tan(jnp.clip(border.astype(jnp.float32), 0, 1) ** 2)
        borders = jnp.clip(jnp.where(borders < 0.05, 0.0, borders), 0, 1)
        mask = cell_s > th_cell
        seed_mask = (cell_s - borders) > th_seed
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

    def filter_fn(sm):
        sm = sm.reshape(stripe_y, stripe_x)
        ext = _with_halo2d(sm, halo, halo, ny, nx, fill=False)
        return _filter_local2d(ext, int(np.floor(min_area)) + 1, 2,
                               halo, halo, stripe_y, stripe_x)

    seed_mask2 = shard_map(
        filter_fn, mesh=mesh, in_specs=(P(AXY, AXX),),
        out_specs=P(AXY, AXX), check_vma=False,
    )(seed_mask)
    seeds2 = spatial_label_components_2d(seed_mask2, mesh)

    labels = spatial_watershed_2d(-cell_s, seeds2, mask, mesh)
    host = np.asarray(jax.device_get(labels))
    return relabel_sequential(host)
