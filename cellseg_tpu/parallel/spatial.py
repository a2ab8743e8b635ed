"""Spatially-sharded whole-slide inference (gigapixel, multi-chip).

BASELINE.json config #5: shard one huge slide's tile grid across a TPU
slice. The image is split into row stripes over a "spatial" mesh axis
(shard_map); every stage exchanges only narrow halos over ICI:

  forward   — each chip runs the tile grid over its stripe; tile outputs
              that overlap the next stripe are sent with one ppermute and
              added into the neighbor's accumulator (exact blending parity
              with the single-chip engine on the same padded canvas);
  filters   — remove_small_holes/objects decisions are provably local
              given a halo ≥ the area threshold (a component with area <
              T fits in a T-diameter box, so any component intersecting
              the owned stripe lies fully inside stripe+halo; components
              touching the halo edge are ≥ T by construction and keep
              their skimage fate);
  labeling  — global connected components with per-iteration 1-row halo
              exchange of label rows; labels are global raster indices, so
              the final map is exact up to a host-side sequential relabel
              (order-preserving, one linear pass).

Everything runs under jax.sharding.Mesh + shard_map; the same code executes
on a virtual CPU mesh in tests and on real ICI-connected chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.cc import _INF, _segmented_min_scan, _sweep_min

AXIS = "spatial"


def _perm(n: int, up: bool):
    """ppermute pairs: up=True sends shard i → i+1 (toward larger row idx)."""
    if up:
        return [(i, i + 1) for i in range(n - 1)]
    return [(i + 1, i) for i in range(n - 1)]


def pad_for_mesh(h: int, w: int, n_dev: int, roi: int, stride: int,
                 min_stripe: int = 64):
    """Padded canvas: uniform tile grid + equal stripes per device.

    min_stripe must cover the decode filter halo (64 px: the larger of the
    hole-fill / small-object area thresholds) so halo-local filter
    decisions stay exact.
    """
    def pad_axis(size):
        size = max(size, roi)
        return size + (-(size - roi)) % stride

    w_pad = pad_axis(w)
    # stripe must be a positive multiple of stride; total H = n * stripe
    h_min = pad_axis(h)
    stripe = max(roi, min_stripe, -(-h_min // n_dev))
    stripe = stripe + (-stripe) % stride
    return n_dev * stripe, w_pad, stripe


def _tiles_to_canvas(tiles: jax.Array, stride: int, roi: int,
                     h_out: int, w_out: int) -> jax.Array:
    """Sum overlapping tile outputs onto a canvas with NO dynamic updates.

    tiles: (ny, nx, roi, roi, C) at origins (i*stride, j*stride) with
    roi <= 2*stride (the 0.25-overlap regime). Split the grid into 2×2
    parity subgrids: within a subgrid tiles are 2*stride apart, hence
    disjoint — each subgrid maps to a canvas layer by pure pad+reshape,
    and the blend is the sum of ≤4 layers. Avoids the read-modify-write
    accumulator that shard_map lowers into full-canvas copies per tile.
    """
    assert roi <= 2 * stride, (roi, stride)
    ny, nx, _, _, c = tiles.shape
    cell = 2 * stride
    layers = []
    for py in (0, 1):
        for px in (0, 1):
            sub = tiles[py::2, px::2]
            my, mx = sub.shape[0], sub.shape[1]
            if my == 0 or mx == 0:
                continue
            # pad each tile to its (cell, cell) slot
            sub = jnp.pad(sub, ((0, 0), (0, 0), (0, cell - roi),
                                (0, cell - roi), (0, 0)))
            layer = sub.transpose(0, 2, 1, 3, 4).reshape(
                my * cell, mx * cell, c)
            # place at the subgrid's global offset, crop/pad to canvas
            oy, ox = py * stride, px * stride
            layer = jnp.pad(layer, ((oy, 0), (ox, 0), (0, 0)))
            layer = layer[:h_out, :w_out]
            ph = h_out - layer.shape[0]
            pw = w_out - layer.shape[1]
            if ph or pw:
                layer = jnp.pad(layer, ((0, ph), (0, pw), (0, 0)))
            layers.append(layer)
    out = layers[0]
    for layer in layers[1:]:
        out = out + layer
    return out


def spatial_sliding_window(apply_fn, params, image, mesh: Mesh,
                           roi: int = 256, sw_batch: int = 8,
                           overlap: float = 0.25, out_channels: int = 3):
    """(H_pad, W_pad, C) sharded forward → (H_pad, W_pad, out_channels).

    image must already be padded via pad_for_mesh and placed with
    PartitionSpec(AXIS, None, None).
    """
    n_dev = mesh.shape[AXIS]
    stride = int(roi * (1.0 - overlap))
    if 2 * stride < roi:
        # the flush-origin edge handling replaces only the LAST on-grid
        # origin, which reproduces tile_origins' clamping exactly iff at
        # most one origin per stripe exceeds size - roi, i.e. stride >=
        # roi/2; larger overlaps would silently blend fabricated ghost
        # context at the canvas edge
        raise ValueError(
            f"overlap {overlap} > 0.5 not supported by the sharded "
            f"engine (roi {roi}, stride {stride})")
    h_pad, w_pad = image.shape[0], image.shape[1]
    stripe = h_pad // n_dev
    halo = roi - stride
    # Per-stripe row origins. h_pad is a stride multiple (n_dev equal
    # stride-multiple stripes), so the single-chip grid's clamped flush
    # origin h_pad - roi (tile_origins semantics) is OFF-grid: the last
    # stripe replaces its last on-grid origin with the flush one so the
    # global tile set matches sliding_window_inference EXACTLY — the
    # bottom tiles must not hang `halo` fabricated zero rows past the
    # canvas (real receptive fields would blend ghost context there).
    ys_local = np.arange(0, stripe, stride, dtype=np.int32)
    ys_last = ys_local.copy()
    ys_last[-1] = stripe - roi
    xs = np.arange(0, w_pad - roi + 1, stride, dtype=np.int32)

    def mk_grid(ys):
        grid = np.stack(np.meshgrid(ys, xs, indexing="ij"), -1).reshape(-1, 2)
        rem = (-len(grid)) % sw_batch
        weights = np.ones(len(grid), np.float32)
        if rem:
            grid = np.concatenate([grid, np.repeat(grid[-1:], rem, 0)])
            weights = np.concatenate([weights, np.zeros(rem, np.float32)])
        return (jnp.asarray(grid.reshape(-1, sw_batch, 2)),
                jnp.asarray(weights.reshape(-1, sw_batch)))

    grid_int_j, weights_j = mk_grid(ys_local)
    grid_edge_j, _ = mk_grid(ys_last)

    n_tiles = (len(ys_local), len(xs))
    # GLOBAL coverage-count map (uniform grid, shard-dependent near the
    # canvas top/bottom): small separable 1-D factors on host; the outer
    # product forms per-shard on device (embedding the 2-D map as a
    # constant would bloat the HLO by h_pad*w_pad floats)
    cnt_rows = np.zeros(h_pad, np.float32)
    for d in range(n_dev):
        for y in (ys_last if d == n_dev - 1 else ys_local):
            cnt_rows[d * stripe + y: d * stripe + y + roi] += 1.0
    cnt_cols = np.zeros(w_pad, np.float32)
    for x in xs:
        cnt_cols[x: x + roi] += 1.0
    cnt_rows_j = jnp.asarray(cnt_rows.reshape(n_dev, stripe))
    cnt_cols_j = jnp.asarray(cnt_cols)

    def shard_fn(params, stripe_img, cnt_r):
        stripe_img = stripe_img.reshape(stripe, w_pad, -1)
        cnt_stripe = jnp.maximum(
            cnt_r.reshape(stripe, 1) * cnt_cols_j[None, :], 1e-8)[..., None]
        c_in = stripe_img.shape[-1]
        # bottom image halo from the next shard (last shard: zeros == pad)
        top_rows = jax.lax.ppermute(
            stripe_img[:halo], AXIS, _perm(n_dev, up=False)
        )
        ext = jnp.concatenate([stripe_img, top_rows], axis=0)

        def gather_tile(origin):
            return jax.lax.dynamic_slice(
                ext, (origin[0], origin[1], 0), (roi, roi, c_in)
            )

        def body(_, batch):
            orgs, _wts = batch
            tiles = jax.vmap(gather_tile)(orgs)
            return None, apply_fn(params, tiles).astype(jnp.float32)

        idx = jax.lax.axis_index(AXIS)
        is_last = idx == n_dev - 1
        grid_j = jnp.where(is_last, grid_edge_j, grid_int_j)
        # scan STACKS outputs — no read-modify-write accumulator, which
        # shard_map fails to keep in place (each update copied the canvas)
        _, stacked = jax.lax.scan(body, None, (grid_j, weights_j))
        tiles_out = stacked.reshape(-1, roi, roi, out_channels)
        tiles_out = tiles_out[: n_tiles[0] * n_tiles[1]]  # drop pad tiles
        tiles_grid = tiles_out.reshape(*n_tiles, roi, roi, out_channels)
        if n_tiles[0] > 1:
            # on-grid rows via the parity-reshape accumulator; the last
            # row of tiles sits at a stripe-dependent origin (on-grid for
            # interior stripes, flush stripe-roi for the last) → placed
            # with one dynamic add
            acc = _tiles_to_canvas(tiles_grid[:-1], stride, roi,
                                   stripe + halo, w_pad)
            strip = _tiles_to_canvas(tiles_grid[-1:], stride, roi,
                                     roi, w_pad)
            y_last = jnp.where(is_last, stripe - roi,
                               (n_tiles[0] - 1) * stride)
            seg = jax.lax.dynamic_slice(acc, (y_last, 0, 0),
                                        (roi, w_pad, out_channels))
            acc = jax.lax.dynamic_update_slice(acc, seg + strip,
                                               (y_last, 0, 0))
        else:
            acc = _tiles_to_canvas(tiles_grid, stride, roi,
                                   stripe + halo, w_pad)

        # ship the overflow rows to the next shard's top
        inc_acc = jax.lax.ppermute(acc[stripe:], AXIS, _perm(n_dev, up=True))
        acc = jnp.concatenate(
            [acc[:halo] + inc_acc, acc[halo:stripe]], axis=0)
        return acc / cnt_stripe

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(AXIS, None, None), P(AXIS, None)),
        out_specs=P(AXIS, None, None),
        check_vma=False,
    )
    return fn(params, image, cnt_rows_j)


def _keep_large_or_edge(mask_ext: jax.Array, threshold: int,
                        connectivity: int, edge: jax.Array) -> jax.Array:
    """Keep-mask over an extended block: component area ≥ threshold OR the
    component touches the caller's edge ring (provably correct for owned
    pixels when halo ≥ threshold — an edge-touching component extends
    beyond the ext, so its true area is unknown but ≥ halo).

    Gather/scatter-free and single-sorted-pass: ONE sort of
    (roots, edge, idx) yields both the segment run lengths (areas) and the
    segment-OR edge flag (prefix + suffix cummax); ONE unsort carries the
    combined 1-byte keep decision back to pixel order. (The previous
    shape — component_areas_by_sort plus a separate edge-flag pass — paid
    4 full-image sorts; sorts are the dominant decode term, BASELINE.md.)
    """
    from ..ops.cc import _root_labels

    shape = mask_ext.shape
    roots = _root_labels(mask_ext, connectivity).ravel()
    flat_mask = mask_ext.ravel()
    edge_flat = jnp.logical_and(edge.ravel(), flat_mask)
    n = roots.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sr, se, si = jax.lax.sort(
        (roots, edge_flat.astype(jnp.int32), idx), num_keys=1,
        is_stable=False)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sr[1:] != sr[:-1]])
    is_end = jnp.concatenate([sr[1:] != sr[:-1], jnp.ones((1,), jnp.bool_)])
    start_pos = jax.lax.cummax(jnp.where(is_start, idx, -1))
    end_pos = -jax.lax.cummax(jnp.where(is_end, -idx, -(n + 1))[::-1])[::-1]
    area_sorted = end_pos - start_pos + 1
    # prefix-OR within segment (fwd) + suffix-OR (bwd) = segment OR
    last_edge = jax.lax.cummax(jnp.where(se > 0, idx, -1))
    fwd_or = last_edge >= start_pos
    first_edge = -jax.lax.cummax(
        jnp.where(se > 0, -idx, -(n + 1))[::-1])[::-1]
    bwd_or = first_edge <= end_pos
    seg_edge = jnp.logical_or(fwd_or, bwd_or)
    big_sorted = jnp.logical_or(area_sorted >= threshold, seg_edge)
    _, big_px = jax.lax.sort(
        (si, big_sorted.astype(jnp.int8)), num_keys=1, is_stable=False)
    return jnp.logical_and(flat_mask, big_px.astype(jnp.bool_)).reshape(shape)


def _filter_local(mask_ext: jax.Array, threshold: int, connectivity: int,
                  halo: int, stripe: int):
    """Area-filter decisions for the owned rows of an extended stripe:
    components touching ext row 0 or he-1 count as large. Returns the
    keep-mask for the owned rows [halo, halo+stripe)."""
    he, w = mask_ext.shape
    edge = jnp.zeros((he, w), jnp.bool_).at[0, :].set(True).at[-1, :].set(True)
    keep = _keep_large_or_edge(mask_ext, threshold, connectivity, edge)
    return keep[halo:halo + stripe]


def spatial_decode_mask(interior_prob, mesh: Mesh, threshold: float = 0.5,
                        hole_area: int = 64, min_size: int = 16):
    """Sharded hole-filling + small-object removal (halo-local, exact)."""
    n_dev = mesh.shape[AXIS]
    h_pad, w_pad = interior_prob.shape
    stripe = h_pad // n_dev
    halo = max(hole_area, min_size)  # 64 covers both thresholds
    if stripe < halo:
        raise ValueError(
            f"stripe {stripe} < filter halo {halo}; pad with "
            f"pad_for_mesh(min_stripe={halo})"
        )

    def shard_fn(prob_stripe):
        prob_stripe = prob_stripe.reshape(stripe, w_pad)
        mask = prob_stripe > threshold

        def with_halo(m):
            top = jax.lax.ppermute(m[-halo:], AXIS, _perm(n_dev, up=True))
            bot = jax.lax.ppermute(m[:halo], AXIS, _perm(n_dev, up=False))
            return jnp.concatenate([top, m, bot], axis=0)

        # hole filling: filter small background components
        inv_ext = jnp.logical_not(with_halo(mask))
        # ghost rows for edge shards arrive as zeros → True after inversion,
        # which would fabricate background; force them to False there.
        idx = jax.lax.axis_index(AXIS)
        row = jnp.arange(stripe + 2 * halo)[:, None]
        fake_top = jnp.logical_and(idx == 0, row < halo)
        fake_bot = jnp.logical_and(idx == n_dev - 1,
                                   row >= stripe + halo)
        inv_ext = jnp.where(jnp.logical_or(fake_top, fake_bot),
                            False, inv_ext)
        # keep_bg True = background component kept (area ≥ 64 or reaches
        # beyond the halo); holes = background NOT kept → fill them
        keep_bg = _filter_local(inv_ext, hole_area, 1, halo, stripe)
        filled = jnp.logical_or(mask, jnp.logical_and(
            jnp.logical_not(mask), jnp.logical_not(keep_bg)))

        # small-object removal on the filled mask
        filled_ext = with_halo(filled)
        keep_fg = _filter_local(filled_ext, min_size, 1, halo, stripe)
        return keep_fg

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS, None),),
        out_specs=P(AXIS, None),
        check_vma=False,
    )
    return fn(interior_prob)


def spatial_label_components(mask, mesh: Mesh, connectivity: int = 2,
                             max_iters: int = 4096):
    """Global connected components over a sharded mask.

    Returns labels as GLOBAL raster root indices (+1, 0 = background) —
    unique per component and raster-ordered, but not sequential; callers
    relabel sequentially on host (order-preserving).
    """
    n_dev = mesh.shape[AXIS]
    h_pad, w_pad = mask.shape
    stripe = h_pad // n_dev

    def shard_fn(m):
        m = m.reshape(stripe, w_pad)
        idx = jax.lax.axis_index(AXIS)
        offset = (idx * stripe * w_pad).astype(jnp.int32)
        lin = jnp.arange(stripe * w_pad, dtype=jnp.int32).reshape(
            stripe, w_pad) + offset
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
            # halo exchange: absorb neighbor boundary rows
            top_ghost = jax.lax.ppermute(
                new[-1:], AXIS, _perm(n_dev, up=True))
            top_ghost = jnp.where(
                jax.lax.axis_index(AXIS) == 0, _INF, top_ghost)
            bot_ghost = jax.lax.ppermute(
                new[:1], AXIS, _perm(n_dev, up=False))
            bot_ghost = jnp.where(
                jax.lax.axis_index(AXIS) == n_dev - 1, _INF, bot_ghost)
            ext = jnp.concatenate([top_ghost, new, bot_ghost], axis=0)
            swept = _sweep_min(
                ext, jnp.concatenate(
                    [jnp.ones((1, w_pad), jnp.bool_), m,
                     jnp.ones((1, w_pad), jnp.bool_)], axis=0),
                connectivity,
            )[1:-1]
            new = jnp.where(m, jnp.minimum(new, swept), _INF)
            changed_local = jnp.any(new != lab)
            changed = jax.lax.pmax(changed_local, AXIS)
            return new, changed, it + 1

        lab, _, _ = jax.lax.while_loop(
            cond, body, (lab, jnp.bool_(True), jnp.int32(0)))
        return jnp.where(m, lab + 1, 0)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS, None),),
        out_specs=P(AXIS, None),
        check_vma=False,
    )
    return fn(mask)


class SpatialPredictor:
    """Sharded whole-slide predictor with per-shape program caching.

    Rebuilding the shard_map closures per call forces a re-trace and a
    (remote) compile-cache lookup each time — tens of seconds at slide
    sizes. This wrapper jits each stage once per padded shape; steady-state
    16 MP forward drops from ~56 s to ~0.13 s on v5e.
    """

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

    def _program(self, h_pad: int, w_pad: int, true_h: int, true_w: int,
                 c_in: int):
        key = (h_pad, w_pad, true_h, true_w, c_in)
        if key in self._progs:
            return self._progs[key]
        mesh = self.mesh

        @jax.jit
        def run(params, dimg):
            # same input contract as the single-chip Predictor: raw bytes
            # in, percentile normalize + /max + channel expansion on
            # device. The percentiles are GLOBAL statistics; under the
            # sharded input XLA lowers the histogram/max reductions to
            # cross-shard collectives automatically.
            if self.normalize:
                from ..pipeline.normalize import normalize_image_jax

                x = normalize_image_jax(dimg).astype(jnp.float32)
            else:
                x = dimg.astype(jnp.float32)
            if x.shape[-1] == 1:
                x = jnp.repeat(x, 3, axis=-1)
            elif x.shape[-1] == 2:
                x = jnp.concatenate(
                    [x, jnp.zeros_like(x[..., :1])], axis=-1)
            if self.normalize:
                x = x / jnp.maximum(jnp.max(x), 1e-8)
            logits = spatial_sliding_window(
                self.apply_fn, params, x, mesh, roi=self.roi,
                sw_batch=self.sw_batch, overlap=self.overlap,
                out_channels=self.num_class)
            interior = jax.nn.softmax(logits, axis=-1)[..., 1]
            rows = jnp.arange(h_pad)[:, None] < true_h
            cols = jnp.arange(w_pad)[None, :] < true_w
            interior = jnp.where(jnp.logical_and(rows, cols), interior, 0.0)
            mask = spatial_decode_mask(interior, mesh)
            labels = spatial_label_components(mask, mesh)
            # sequential relabel on device (sharded sorts): the host only
            # receives the final compact map
            from ..ops.cc import relabel_sequential_device

            return relabel_sequential_device(labels)

        self._progs[key] = run
        return run

    def predict(self, image: np.ndarray) -> np.ndarray:
        """Raw image (H, W[, C]) → instance labels; channels are expanded
        and normalized on device (1-channel grayscale uploads stay 1
        channel over the link)."""
        from ..io.images import to_hwc_raw

        image = to_hwc_raw(image)
        n_dev = self.mesh.shape[AXIS]
        h, w, c = image.shape
        stride = int(self.roi * (1 - self.overlap))
        h_pad, w_pad, _ = pad_for_mesh(h, w, n_dev, self.roi, stride)
        padded = np.zeros((h_pad, w_pad, c),
                          image.dtype if self.normalize else np.float32)
        padded[:h, :w] = image
        sharding = NamedSharding(self.mesh, P(AXIS, None, None))
        dimg = jax.device_put(jnp.asarray(padded), sharding)
        run = self._program(h_pad, w_pad, h, w, c)
        labels = run(self.params, dimg)
        return np.asarray(jax.device_get(labels))[:h, :w]


def spatial_predict(apply_fn, params, image: np.ndarray, mesh: Mesh,
                    roi: int = 256, sw_batch: int = 8, overlap: float = 0.25,
                    num_class: int = 3, normalize: bool = False) -> np.ndarray:
    """Full sharded pipeline: model-ready float image (H, W, C) →
    instance labels (normalize=False). Pass normalize=True (or use
    SpatialPredictor, whose default matches the single-chip Predictor) for
    raw byte inputs.

    One-shot convenience wrapper; reuse a SpatialPredictor for repeated
    slides of the same shape.
    """
    return SpatialPredictor(
        apply_fn, params, mesh, roi=roi, sw_batch=sw_batch,
        overlap=overlap, num_class=num_class, normalize=normalize,
    ).predict(image)
