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


@functools.partial(jax.jit, static_argnames=("n_iter", "method"))
def decode_flow(flow: jax.Array, cellprob: jax.Array,
                prob_threshold: float = 0.0, n_iter: int = 100,
                method: str = "doubling") -> jax.Array:
    """flow (H, W, 2) + cellprob logits (H, W) → int32 instance labels.

    method="doubling" (default): a few Euler steps build a pixel→pixel
    successor map, then pointer doubling (succ = succ∘succ) follows
    2^k flow steps with only ⌈log2(n_iter)⌉ gathers — TPU gathers cost
    ~30 ms at 4 MP, so this is ~50× cheaper than stepwise tracking.
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
