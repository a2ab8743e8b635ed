"""Spatially-sharded whole-slide inference over a 2-D (rows × cols) mesh.

The 1-D row-stripe engine (parallel/spatial.py) forces
h_pad = n_dev * stripe with stripe ≥ max(roi, 64): an 8-device mesh needs a
≥2048-row canvas, so short-and-wide slides pad massively and column-dominant
slides get no benefit. This module shards BOTH axes over a
Mesh(("sy", "sx")): a 1024×16384 slide on a (2, 4) mesh pads to
1024×16384 instead of 2048×16384 (zero waste), and >8-device meshes can
stay near-square.

Same algorithms as the 1-D engine, with two-phase halo exchange
(columns along "sx" on the row-extended array, then rows along "sy") so
diagonal neighbors are covered without explicit corner sends:

  forward   — per-block tile grid; overflow accumulator regions ship right
              then down (the bottom-right corner rides both hops);
  filters   — halo-local hole/object filters, exact for halo ≥ threshold;
              components touching any extended-block border are
              conservatively large (all four sides now, not two);
  labeling  — global CC with per-iteration 1-px boundary exchange in both
              axes; labels are global raster indices, relabeled
              sequentially on device.

Reference workload being scaled: baseline/predict.py:100-113 over
arbitrarily large slides (SURVEY.md §5 long-context analog).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.cc import _INF, _segmented_min_scan, _sweep_min
from .spatial import _perm

AXY = "sy"  # row-block axis
AXX = "sx"  # col-block axis


def make_mesh2d(ny: int, nx: int) -> Mesh:
    devs = np.asarray(jax.devices()[: ny * nx]).reshape(ny, nx)
    return Mesh(devs, (AXY, AXX))


def pad_for_mesh2d(h: int, w: int, ny: int, nx: int, roi: int, stride: int,
                   min_stripe: int = 64):
    """Padded canvas: uniform tile grid + equal (stripe_y × stripe_x)
    blocks per device. Both stripes are stride multiples ≥ max(roi,
    min_stripe) so tile grids and filter halos stay exact."""
    def block(size, n):
        size = max(size, roi)
        size = size + (-(size - roi)) % stride
        stripe = max(roi, min_stripe, -(-size // n))
        stripe = stripe + (-stripe) % stride
        return n * stripe, stripe

    h_pad, stripe_y = block(h, ny)
    w_pad, stripe_x = block(w, nx)
    return h_pad, w_pad, stripe_y, stripe_x


def _ship_cols(arr, k, ny, nx, right: bool, fill):
    """k boundary cols to the sx neighbor; mesh-edge blocks receive fill."""
    src = arr[:, -k:] if right else arr[:, :k]
    ghost = jax.lax.ppermute(src, AXX, _perm(nx, right))
    ix = jax.lax.axis_index(AXX)
    bad = (ix == 0) if right else (ix == nx - 1)
    return jnp.where(bad, fill, ghost)


def _ship_rows(arr, k, ny, nx, down: bool, fill):
    src = arr[-k:] if down else arr[:k]
    ghost = jax.lax.ppermute(src, AXY, _perm(ny, down))
    iy = jax.lax.axis_index(AXY)
    bad = (iy == 0) if down else (iy == ny - 1)
    return jnp.where(bad, fill, ghost)


def _with_halo2d(m, hy, hx, ny, nx, fill):
    """Extend a (sy, sx[, c]) block by hy rows / hx cols from all four mesh
    neighbors (two-phase: cols first, then rows of the col-extended array,
    which carries the diagonal corners)."""
    left = _ship_cols(m, hx, ny, nx, right=True, fill=fill)
    right = _ship_cols(m, hx, ny, nx, right=False, fill=fill)
    wide = jnp.concatenate([left, m, right], axis=1)
    top = _ship_rows(wide, hy, ny, nx, down=True, fill=fill)
    bot = _ship_rows(wide, hy, ny, nx, down=False, fill=fill)
    return jnp.concatenate([top, wide, bot], axis=0)


def spatial_sliding_window_2d(apply_fn, params, image, mesh: Mesh,
                              roi: int = 256, sw_batch: int = 8,
                              overlap: float = 0.25, out_channels: int = 3):
    """(H_pad, W_pad, C) sharded P(AXY, AXX, None) → logits canvas with
    exact overlap blending (parity with the single-chip engine)."""
    ny, nx = mesh.shape[AXY], mesh.shape[AXX]
    stride = int(roi * (1.0 - overlap))
    if 2 * stride < roi:
        # see spatial.spatial_sliding_window: the single flush origin per
        # block axis is exact only for overlap <= 0.5
        raise ValueError(
            f"overlap {overlap} > 0.5 not supported by the sharded "
            f"engine (roi {roi}, stride {stride})")
    h_pad, w_pad = image.shape[0], image.shape[1]
    stripe_y, stripe_x = h_pad // ny, w_pad // nx
    halo = roi - stride
    # Per-block tile origins. Both canvas axes are stride multiples, so
    # the single-chip grid's clamped flush origins (size - roi, see
    # infer/sliding_window.tile_origins) are OFF-grid: mesh-edge blocks
    # replace their last on-grid origin with the flush one so the global
    # tile set matches sliding_window_inference EXACTLY — edge tiles must
    # not hang `halo` fabricated zero rows/cols past the canvas (real
    # receptive fields would blend ghost context there).
    ys = np.arange(0, stripe_y, stride, dtype=np.int32)
    xs = np.arange(0, stripe_x, stride, dtype=np.int32)
    ys_edge = ys.copy()
    ys_edge[-1] = stripe_y - roi
    xs_edge = xs.copy()
    xs_edge[-1] = stripe_x - roi
    n_tiles = (len(ys), len(xs))

    def mk_grid(yy, xx):
        grid = np.stack(np.meshgrid(yy, xx, indexing="ij"), -1).reshape(-1, 2)
        rem = (-len(grid)) % sw_batch
        if rem:
            grid = np.concatenate([grid, np.repeat(grid[-1:], rem, 0)])
        return jnp.asarray(grid.reshape(-1, sw_batch, 2))

    grids_j = {(ey, ex): mk_grid(ys_edge if ey else ys,
                                 xs_edge if ex else xs)
               for ey in (0, 1) for ex in (0, 1)}

    # separable global coverage counts (edge blocks use the flush grids)
    cnt_rows = np.zeros(h_pad, np.float32)
    for d in range(ny):
        for y in (ys_edge if d == ny - 1 else ys):
            cnt_rows[d * stripe_y + y: d * stripe_y + y + roi] += 1.0
    cnt_cols = np.zeros(w_pad, np.float32)
    for d in range(nx):
        for x in (xs_edge if d == nx - 1 else xs):
            cnt_cols[d * stripe_x + x: d * stripe_x + x + roi] += 1.0
    cnt_rows_j = jnp.asarray(cnt_rows.reshape(ny, stripe_y))
    cnt_cols_j = jnp.asarray(cnt_cols.reshape(nx, stripe_x))

    from .spatial import _tiles_to_canvas

    def shard_fn(params, blk, cnt_r, cnt_c):
        blk = blk.reshape(stripe_y, stripe_x, -1)
        c_in = blk.shape[-1]
        cnt = jnp.maximum(
            cnt_r.reshape(stripe_y, 1) * cnt_c.reshape(1, stripe_x),
            1e-8)[..., None]
        # image halo: bottom rows and right cols from the neighbors
        right = _ship_cols(blk, halo, ny, nx, right=False, fill=0.0)
        wide = jnp.concatenate([blk, right], axis=1)
        below = _ship_rows(wide, halo, ny, nx, down=False, fill=0.0)
        ext = jnp.concatenate([wide, below], axis=0)

        def gather_tile(origin):
            return jax.lax.dynamic_slice(
                ext, (origin[0], origin[1], 0), (roi, roi, c_in))

        def body(_, orgs):
            tiles = jax.vmap(gather_tile)(orgs)
            return None, apply_fn(params, tiles).astype(jnp.float32)

        iy = jax.lax.axis_index(AXY)
        ix = jax.lax.axis_index(AXX)
        is_ly, is_lx = iy == ny - 1, ix == nx - 1
        grid_j = jnp.where(
            is_ly,
            jnp.where(is_lx, grids_j[(1, 1)], grids_j[(1, 0)]),
            jnp.where(is_lx, grids_j[(0, 1)], grids_j[(0, 0)]))
        _, stacked = jax.lax.scan(body, None, grid_j)
        tiles_out = stacked.reshape(-1, roi, roi, out_channels)
        tiles_out = tiles_out[: n_tiles[0] * n_tiles[1]]
        tg = tiles_out.reshape(*n_tiles, roi, roi, out_channels)
        ty, tx = n_tiles
        hy_out, wx_out = stripe_y + halo, stripe_x + halo
        # the last row/col of tiles sit at block-dependent origins
        # (on-grid interior, flush at the mesh edge) → dynamic adds
        y_last = jnp.where(is_ly, stripe_y - roi, (ty - 1) * stride)
        x_last = jnp.where(is_lx, stripe_x - roi, (tx - 1) * stride)

        def dyn_add(canvas, patch, oy, ox):
            shp = (patch.shape[0], patch.shape[1], out_channels)
            seg = jax.lax.dynamic_slice(canvas, (oy, ox, 0), shp)
            return jax.lax.dynamic_update_slice(canvas, seg + patch,
                                                (oy, ox, 0))

        acc = jnp.zeros((hy_out, wx_out, out_channels), jnp.float32)
        if ty > 1 and tx > 1:
            acc = acc + _tiles_to_canvas(tg[:-1, :-1], stride, roi,
                                         hy_out, wx_out)
        if tx > 1:
            strip = _tiles_to_canvas(tg[-1:, :-1], stride, roi,
                                     roi, wx_out)
            acc = dyn_add(acc, strip, y_last, 0)
        if ty > 1:
            strip = _tiles_to_canvas(tg[:-1, -1:], stride, roi,
                                     hy_out, roi)
            acc = dyn_add(acc, strip, 0, x_last)
        acc = dyn_add(acc, tg[-1, -1], y_last, x_last)

        # ship overflow right, then down (corner rides both hops)
        inc_c = _ship_cols(acc, halo, ny, nx, right=True, fill=0.0)
        acc = jnp.concatenate(
            [acc[:, :halo] + inc_c, acc[:, halo:stripe_x]], axis=1)
        inc_r = _ship_rows(acc, halo, ny, nx, down=True, fill=0.0)
        acc = jnp.concatenate(
            [acc[:halo] + inc_r, acc[halo:stripe_y]], axis=0)
        return acc / cnt

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(AXY, AXX, None), P(AXY, None), P(AXX, None)),
        out_specs=P(AXY, AXX, None),
        check_vma=False,
    )
    return fn(params, image, cnt_rows_j, cnt_cols_j)


def _filter_local2d(mask_ext: jax.Array, threshold: int, connectivity: int,
                    hy: int, hx: int, stripe_y: int, stripe_x: int):
    """Area-filter keep-decisions for the owned region of an extended
    block. Components touching ANY of the four extended-block borders are
    treated as area ≥ threshold (exact for owned pixels when halo ≥
    threshold; mesh-edge blocks have all-False ghosts so nothing touches
    their outer borders)."""
    from .spatial import _keep_large_or_edge

    he, we = mask_ext.shape
    edge = jnp.zeros((he, we), jnp.bool_)
    edge = edge.at[0, :].set(True).at[-1, :].set(True)
    edge = edge.at[:, 0].set(True).at[:, -1].set(True)
    keep = _keep_large_or_edge(mask_ext, threshold, connectivity, edge)
    return keep[hy:hy + stripe_y, hx:hx + stripe_x]


def spatial_decode_mask_2d(interior_prob, mesh: Mesh, threshold: float = 0.5,
                           hole_area: int = 64, min_size: int = 16):
    """Sharded hole-filling + small-object removal on a 2-D block mesh."""
    ny, nx = mesh.shape[AXY], mesh.shape[AXX]
    h_pad, w_pad = interior_prob.shape
    stripe_y, stripe_x = h_pad // ny, w_pad // nx
    halo = max(hole_area, min_size)
    if stripe_y < halo or stripe_x < halo:
        raise ValueError(
            f"block ({stripe_y},{stripe_x}) < filter halo {halo}; pad with "
            f"pad_for_mesh2d(min_stripe={halo})")

    def shard_fn(prob_blk):
        prob_blk = prob_blk.reshape(stripe_y, stripe_x)
        mask = prob_blk > threshold

        # hole filling: ghosts arrive False; inverted they would fabricate
        # background beyond the slide — _ship_* already fills mesh-edge
        # ghosts, so invert AFTER extension with fill=False on both phases.
        ext = _with_halo2d(mask, halo, halo, ny, nx, fill=False)
        inv_ext = jnp.logical_not(ext)
        # force the outer ghost ring of mesh-edge blocks back to False
        iy, ix = jax.lax.axis_index(AXY), jax.lax.axis_index(AXX)
        row = jnp.arange(stripe_y + 2 * halo)[:, None]
        col = jnp.arange(stripe_x + 2 * halo)[None, :]
        fake = jnp.logical_or(
            jnp.logical_or(jnp.logical_and(iy == 0, row < halo),
                           jnp.logical_and(iy == ny - 1,
                                           row >= stripe_y + halo)),
            jnp.logical_or(jnp.logical_and(ix == 0, col < halo),
                           jnp.logical_and(ix == nx - 1,
                                           col >= stripe_x + halo)))
        inv_ext = jnp.where(fake, False, inv_ext)
        keep_bg = _filter_local2d(inv_ext, hole_area, 1, halo, halo,
                                  stripe_y, stripe_x)
        filled = jnp.logical_or(mask, jnp.logical_and(
            jnp.logical_not(mask), jnp.logical_not(keep_bg)))

        filled_ext = _with_halo2d(filled, halo, halo, ny, nx, fill=False)
        keep_fg = _filter_local2d(filled_ext, min_size, 1, halo, halo,
                                  stripe_y, stripe_x)
        return keep_fg

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXY, AXX),),
        out_specs=P(AXY, AXX),
        check_vma=False,
    )
    return fn(interior_prob)


def spatial_label_components_2d(mask, mesh: Mesh, connectivity: int = 2,
                                max_iters: int = 4096):
    """Global CC over a 2-D-block-sharded mask; labels are global raster
    root indices + 1 (0 = background)."""
    ny, nx = mesh.shape[AXY], mesh.shape[AXX]
    h_pad, w_pad = mask.shape
    stripe_y, stripe_x = h_pad // ny, w_pad // nx

    def shard_fn(m):
        m = m.reshape(stripe_y, stripe_x)
        iy, ix = jax.lax.axis_index(AXY), jax.lax.axis_index(AXX)
        rows = (iy * stripe_y
                + jnp.arange(stripe_y, dtype=jnp.int32))[:, None]
        cols = (ix * stripe_x
                + jnp.arange(stripe_x, dtype=jnp.int32))[None, :]
        lin = rows * jnp.int32(w_pad) + cols
        lab = jnp.where(m, lin, _INF)

        def cond(state):
            _, changed, it = state
            return jnp.logical_and(changed, it < max_iters)

        def body(state):
            lab, _, it = state
            new = lab
            for _ in range(2):
                new = _sweep_min(new, m, connectivity)
            new = _segmented_min_scan(new, m, axis=1)
            new = _segmented_min_scan(new, m, axis=0)
            # two-phase 1-px boundary exchange (corners ride along)
            ext = _with_halo2d(new, 1, 1, ny, nx, fill=_INF)
            m_ext = jnp.pad(m, 1, constant_values=True)
            swept = _sweep_min(ext, m_ext, connectivity)[1:-1, 1:-1]
            new = jnp.where(m, jnp.minimum(new, swept), _INF)
            changed = jax.lax.pmax(
                jax.lax.pmax(jnp.any(new != lab), AXY), AXX)
            return new, changed, it + 1

        lab, _, _ = jax.lax.while_loop(
            cond, body, (lab, jnp.bool_(True), jnp.int32(0)))
        return jnp.where(m, lab + 1, 0)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXY, AXX),),
        out_specs=P(AXY, AXX),
        check_vma=False,
    )
    return fn(mask)


class SpatialPredictor2D:
    """Whole-slide predictor over a 2-D (rows × cols) device mesh, same
    input/output contract as parallel.SpatialPredictor."""

    def __init__(self, apply_fn, params, mesh: Mesh, roi: int = 256,
                 sw_batch: int = 8, overlap: float = 0.25,
                 num_class: int = 3, normalize: bool = True):
        self.apply_fn = apply_fn
        self.params = params
        self.mesh = mesh
        self.roi = roi
        self.sw_batch = sw_batch
        self.overlap = overlap
        self.num_class = num_class
        self.normalize = normalize
        self._progs = {}

    def _program(self, h_pad, w_pad, true_h, true_w, c_in):
        key = (h_pad, w_pad, true_h, true_w, c_in)
        if key in self._progs:
            return self._progs[key]
        mesh = self.mesh

        @jax.jit
        def run(params, dimg):
            if self.normalize:
                from ..pipeline.normalize import normalize_image_jax

                x = normalize_image_jax(dimg).astype(jnp.float32)
            else:
                x = dimg.astype(jnp.float32)
            if x.shape[-1] == 1:
                x = jnp.repeat(x, 3, axis=-1)
            elif x.shape[-1] == 2:
                x = jnp.concatenate([x, jnp.zeros_like(x[..., :1])], axis=-1)
            if self.normalize:
                x = x / jnp.maximum(jnp.max(x), 1e-8)
            logits = spatial_sliding_window_2d(
                self.apply_fn, params, x, mesh, roi=self.roi,
                sw_batch=self.sw_batch, overlap=self.overlap,
                out_channels=self.num_class)
            interior = jax.nn.softmax(logits, axis=-1)[..., 1]
            rows = jnp.arange(h_pad)[:, None] < true_h
            cols = jnp.arange(w_pad)[None, :] < true_w
            interior = jnp.where(jnp.logical_and(rows, cols), interior, 0.0)
            mask = spatial_decode_mask_2d(interior, mesh)
            labels = spatial_label_components_2d(mask, mesh)
            from ..ops.cc import relabel_sequential_device

            return relabel_sequential_device(labels)

        self._progs[key] = run
        return run

    def predict(self, image: np.ndarray) -> np.ndarray:
        from ..io.images import to_hwc_raw

        image = to_hwc_raw(image)
        ny, nx = self.mesh.shape[AXY], self.mesh.shape[AXX]
        h, w, c = image.shape
        stride = int(self.roi * (1 - self.overlap))
        h_pad, w_pad, _, _ = pad_for_mesh2d(h, w, ny, nx, self.roi, stride)
        padded = np.zeros((h_pad, w_pad, c),
                          image.dtype if self.normalize else np.float32)
        padded[:h, :w] = image
        sharding = NamedSharding(self.mesh, P(AXY, AXX, None))
        dimg = jax.device_put(jnp.asarray(padded), sharding)
        run = self._program(h_pad, w_pad, h, w, c)
        labels = run(self.params, dimg)
        return np.asarray(jax.device_get(labels))[:h, :w]
