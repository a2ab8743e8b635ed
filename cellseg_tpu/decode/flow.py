"""Flow-field instance decoding (cellpose-style gradient tracking).

On-device rebuild of cellpose's `follow_flows` + `get_masks`: every pixel
above the cell-probability threshold follows the predicted flow field for a
fixed number of Euler steps (bilinear flow sampling); pixels that converge
to the same attractor belong to one instance. Clustering happens by
snapping final positions to the pixel grid, dilating the landing histogram,
and connected-components labeling the attractor basins — all on device via
the CC kernel.

Capability target of the reference's cellpose wrappers
(cellpose-omnipose-KIT-GE/test_cellpose_cyto2_grey.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cc import label_components


def _read_at(arr: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    """out[y, x] = arr[y + dy, x + dx] (static small offset), `fill` outside."""
    h, w = arr.shape
    pad = ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)))
    padded = jnp.pad(arr, pad, constant_values=fill)
    return jax.lax.dynamic_slice(padded, (max(dy, 0), max(dx, 0)), (h, w))


def _bilinear(field: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample (H, W) field at float coords (clamped)."""
    h, w = field.shape
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    f = field.ravel()
    g = lambda yy, xx: f[yy * w + xx]
    return (g(y0, x0) * (1 - wy) * (1 - wx) + g(y0, x1) * (1 - wy) * wx +
            g(y1, x0) * wy * (1 - wx) + g(y1, x1) * wy * wx)


def _decode_propagate(fy: jax.Array, fx: jax.Array, mask: jax.Array,
                      n_iter: int,
                      cores: jax.Array | None = None) -> jax.Array:
    """Gather-free flow tracking via bounded-window pointer propagation.

    The 2-hop seeded successor offset is bounded by ±2 px per axis (unit
    flows, each hop ≤ ~1.2 px after the grid snap — identical seeding to
    the doubling method: hop 1 at integer coords is the exact table value,
    hop 2 samples nearest-neighbor at the ±1 offset, here as a 9-way
    static window select). With the successor inside the 5×5 window,
    every pointer-graph operation is a static shifted-plane select:

      1. attractor cores: unit mass is pushed along the pointers for T
         hops (the landing histogram, scatter-free — 25 shifted compares
         per hop); after T hops a transit pixel holds only mass that
         originated exactly T hops upstream, so transit mass decays to
         0/1 while attractor mass accumulates — mass > 2 reproduces the
         doubling method's hist > 2 core rule.
      2. basin labels: cores are 3×3-dilated and CC-labeled (same as
         doubling), then labels flow BACKWARD along the pointers
         (label[i] ← label[i + off[i]]) to a while_loop fixed point —
         each masked pixel takes the first core its trajectory enters,
         and trajectories never cross cell boundaries (flows point
         inward), so this matches landing-basin assignment.

    Saturation: offsets are clipped to the window, so predicted flow
    magnitudes > ~1.4 px/step saturate at 2 px/hop (targets are unit
    vectors; measured zero-shot F1 is the parity gate).
    """
    h, w = mask.shape
    yf = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xf = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    # hop 1: integer coords — bilinear sampling IS the table value
    p1y = jnp.clip(yf + fy, 0.0, h - 1.0)
    p1x = jnp.clip(xf + fx, 0.0, w - 1.0)
    o1y = jnp.clip(jnp.round(p1y) - yf, -1, 1).astype(jnp.int32)
    o1x = jnp.clip(jnp.round(p1x) - xf, -1, 1).astype(jnp.int32)
    # hop 2: nearest-neighbor flow sample at the ±1 offset, 9-way select
    c1 = (o1y + 1) * 3 + (o1x + 1)
    d2y = fy
    d2x = fx
    for k in range(9):
        oy, ox = k // 3 - 1, k % 3 - 1
        if oy == 0 and ox == 0:
            continue
        sel = c1 == k
        d2y = jnp.where(sel, _read_at(fy, oy, ox, 0.0), d2y)
        d2x = jnp.where(sel, _read_at(fx, oy, ox, 0.0), d2x)
    p2y = jnp.clip(p1y + d2y, 0.0, h - 1.0)
    p2x = jnp.clip(p1x + d2x, 0.0, w - 1.0)
    oy2 = jnp.clip(jnp.round(p2y) - yf, -2, 2).astype(jnp.int32)
    ox2 = jnp.clip(jnp.round(p2x) - xf, -2, 2).astype(jnp.int32)
    code = ((oy2 + 2) * 5 + (ox2 + 2)).astype(jnp.int8)  # 0..24
    offs = [(k // 5 - 2, k % 5 - 2) for k in range(25)]

    # 1. attractor cores. Default: unit mass pushed along the pointers
    # for T hops (the landing histogram as 25 shifted compares). With an
    # explicit `cores` plane (the omnipose-representation decode derives
    # cores from the predicted distance field — a POINT attractor rule
    # fragments along elongated skeletons), skip the push entirely.
    if cores is None:
        t_push = max(4, min(16, n_iter // 8))
        m0 = mask.astype(jnp.int8)

        def push(_, m):
            acc = jnp.zeros((h, w), jnp.int32)
            for k, (dy, dx) in enumerate(offs):
                src_code = _read_at(code, -dy, -dx, -1)
                src_m = _read_at(m, -dy, -dx, 0).astype(jnp.int32)
                acc = acc + jnp.where(src_code == k, src_m, 0)
            return jnp.minimum(acc, 100).astype(jnp.int8)

        mass = jax.lax.fori_loop(0, t_push, push, m0)
        core = mass > 2
        # point-attractor cores are scattered grid cells of one attractor:
        # 3×3-dilate to merge them before labeling (same as doubling)
        core = jax.lax.reduce_window(
            core.astype(jnp.int32), 0, jax.lax.max, (3, 3), (1, 1), "SAME"
        ) > 0
    else:
        # explicit ridge cores are already connected regions along each
        # cell's interior — dilation only bridges the 1-2 px gaps between
        # touching cells' ridges (measured +3 merges/image on the rod set)
        core = jnp.logical_and(cores, mask)
    basins = label_components(core, connectivity=2)

    # 2. backward label propagation to the fixed point
    def body(state):
        lab, _, it = state
        cand = lab
        for k, (dy, dx) in enumerate(offs):
            if dy == 0 and dx == 0:
                continue
            cand = jnp.where(code == k, _read_at(lab, dy, dx, 0), cand)
        new = jnp.where(lab > 0, lab, cand)
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < n_iter)

    lab = jax.lax.while_loop(
        cond, body, (basins, jnp.bool_(True), jnp.int32(0)))[0]
    return jnp.where(mask, lab, 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_iter", "method"))
def decode_flow(flow: jax.Array, cellprob: jax.Array,
                prob_threshold: float = 0.0, n_iter: int = 100,
                method: str = "propagate",
                cores: jax.Array | None = None) -> jax.Array:
    """flow (H, W, 2) + cellprob logits (H, W) → int32 instance labels.

    method="propagate" (default): fully gather-free tracking. Two seeded
    Euler hops build a pixel→successor offset field whose reach is bounded
    by ±2 px (flows are unit vectors — pipeline/flow_labels.py:70), so the
    successor lives inside each pixel's 5×5 window and every graph
    operation becomes a static window select instead of a gather:
    attractor cores are found by pushing unit mass along the pointers
    (the landing histogram as 25 shifted compares, no scatter) and basin
    labels flow BACKWARD along the pointers to a while_loop fixed point.
    TPU cost model: a full-image gather ≈ 60-85 ms at 4.2 MP while a
    25-way window select is a fused elementwise pass ≈ 1-2 ms, so this
    replaces the doubling method's ⌈log2 n_iter⌉ gathers + 1 scatter + 1
    final gather with ~30 cheap passes.
    With an explicit `cores` bool plane (propagate method only), core
    detection is skipped and basins start from the given plane — the
    omnipose-representation decode passes `dist > core_threshold`, whose
    components are connected along a cell's interior ridge but separated
    across touching cells (a point-attractor rule fragments along the
    elongated skeletons the omni flows converge to).
    method="doubling": a few Euler steps build a pixel→pixel
    successor map, then pointer doubling (succ = succ∘succ) follows
    2^k flow steps with only ⌈log2(n_iter)⌉ gathers.
    method="euler": cellpose-style per-step bilinear tracking.
    method="omni": omnipose-style suppressed Euler — step size decays as
    1/(1 + i/suppress) over iterations, which keeps trajectories inside
    thin/elongated cells instead of overshooting through their skeleton
    (the behavior the omnipose wrapper provides via `omni=True`,
    cellpose-omnipose-KIT-GE/test_omnipose_cyto2_grey.py:23-28; a
    capability analog, not a numerical port of omnipose internals).
    """
    h, w = cellprob.shape
    mask = cellprob > prob_threshold
    fy = flow[..., 0].astype(jnp.float32)
    fx = flow[..., 1].astype(jnp.float32)

    if method == "propagate":
        return _decode_propagate(fy, fx, mask, n_iter, cores)

    ys0 = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).ravel()
    xs0 = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).ravel()

    def step(i, yx, suppress=0.0):
        ys, xs = yx
        dy = _bilinear(fy, ys, xs)
        dx = _bilinear(fx, ys, xs)
        damp = jnp.where(suppress > 0.0,
                         1.0 / (1.0 + i.astype(jnp.float32) / jnp.maximum(suppress, 1e-6)),
                         1.0)
        ys = jnp.clip(ys + damp * dy, 0.0, h - 1.0)
        xs = jnp.clip(xs + damp * dx, 0.0, w - 1.0)
        return ys, xs

    if method == "euler":
        ys, xs = jax.lax.fori_loop(0, n_iter, step, (ys0, xs0))
    elif method == "omni":
        ys, xs = jax.lax.fori_loop(
            0, n_iter, lambda i, yx: step(i, yx, suppress=10.0), (ys0, xs0))
    else:
        # two Euler steps to seed the successor map, then snap to the grid
        # and double pointers. Step 1 starts at integer coordinates, where
        # bilinear sampling IS the exact table value — pure elementwise,
        # no gather. Step 2 samples nearest-neighbor instead of bilinear:
        # the snap quantizes to the pixel grid right after, so sub-pixel
        # interpolation buys <0.5 px here while costing 8 full-image
        # gathers (measured 1352 → 62 ms at 4.2 MP — TPU gathers run
        # ~60-85 ms each at this size; the "euler"/"omni" methods keep
        # cellpose's bilinear trajectory semantics).
        ys = jnp.clip(ys0 + fy.ravel(), 0.0, h - 1.0)
        xs = jnp.clip(xs0 + fx.ravel(), 0.0, w - 1.0)
        yi = jnp.clip(jnp.round(ys), 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(jnp.round(xs), 0, w - 1).astype(jnp.int32)
        fc = (fy + 1j * fx).astype(jnp.complex64).ravel()
        d = fc[yi * w + xi]
        ys = jnp.clip(ys + d.real, 0.0, h - 1.0)
        xs = jnp.clip(xs + d.imag, 0.0, w - 1.0)
        succ = (jnp.clip(jnp.round(ys), 0, h - 1).astype(jnp.int32) * w
                + jnp.clip(jnp.round(xs), 0, w - 1).astype(jnp.int32))
        n_doublings = max(int(np.ceil(np.log2(max(n_iter, 2)))), 1)
        for _ in range(n_doublings):
            succ = succ[succ]
        ys = (succ // w).astype(jnp.float32)
        xs = (succ % w).astype(jnp.float32)

    # landing histogram: attractor basins are where many pixels land
    # (doubling/euler/omni tail — the propagate method returned above)
    yi = jnp.round(ys).astype(jnp.int32)
    xi = jnp.round(xs).astype(jnp.int32)
    land = yi * w + xi
    hist = jnp.zeros((h * w,), jnp.int32).at[land].add(
        mask.ravel().astype(jnp.int32)
    )
    hist = hist.reshape(h, w)
    # attractor cores: grid cells collecting more mass than their
    # surroundings; dilate to merge adjacent cores of the same attractor
    core = hist > 2
    core_d = jax.lax.reduce_window(
        core.astype(jnp.int32), 0, jax.lax.max, (3, 3), (1, 1), "SAME"
    ) > 0
    basins = label_components(core_d, connectivity=2)
    # each masked pixel takes the basin label where it landed
    pixel_label = basins.ravel()[land]
    out = jnp.where(mask.ravel(), pixel_label, 0)
    return out.reshape(h, w).astype(jnp.int32)
