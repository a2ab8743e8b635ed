"""Forward-stage decomposition at the bench shape (VERDICT r5 item 2).

The per-level roofline (scripts/roofline_unet.py) measured the raw B=128
conv forward at ~3.2 ms (28.7% MFU, ≥100% of the analytic-bytes HBM
roofline) while the bench's forward STAGE reports ~12 ms — this script
splits the sliding-window machinery apart to find the gap: tile gather,
conv forward, blend (tiles_to_canvas ×2), normalize division, softmax.

Run on the real chip: python scripts/profile_forward.py
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from cellseg_tpu.infer.sliding_window import (_gaussian_importance,
                                              balanced_sw_batch,
                                              sliding_window_inference,
                                              tile_origins, tiles_to_canvas)
from cellseg_tpu.models import build_model


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def _rtt():
    tiny = jnp.zeros((8,), jnp.float32)
    _sync(tiny)
    rs = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tiny)
        rs.append(time.perf_counter() - t0)
    return float(np.median(rs))


def timed(fn, *args, n=10, rounds=5):
    _sync(fn(*args))
    rtt = _rtt()
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        _sync(outs[-1])
        ts.append(((time.perf_counter() - t0) - rtt) * 1e3 / n)
    return float(np.median(ts))


def main():
    P = 2176
    roi, overlap = 256, 0.25
    stride = int(roi * (1 - overlap))
    model = build_model("unet", num_class=3, dtype=jnp.bfloat16)
    x1 = jnp.zeros((1, roi, roi, 3), jnp.float32)
    params = jax.device_put(model.init(jax.random.PRNGKey(0), x1))

    img = jax.device_put(
        jnp.asarray(np.random.RandomState(0).rand(P, P, 3), jnp.float32))
    ys = tile_origins(P, roi, overlap)
    n_side = len(ys)
    n_tiles = n_side * n_side
    sw = balanced_sw_batch(n_tiles)
    print(f"grid {n_side}x{n_side}={n_tiles} tiles, balanced sw_batch={sw}")

    grid = np.stack(np.meshgrid(ys, ys, indexing="ij"), -1).reshape(-1, 2)
    rem = (-len(grid)) % sw
    if rem:
        grid = np.concatenate([grid, np.repeat(grid[-1:], rem, 0)])
    origins = jnp.asarray(grid)

    # 1. tile gather only
    @jax.jit
    def gather_only(im, orgs):
        def g(o):
            return jax.lax.dynamic_slice(im, (o[0], o[1], 0), (roi, roi, 3))
        return jax.vmap(g)(orgs)

    ms = timed(gather_only, img, origins)
    print(f"gather {len(grid)} tiles:          {ms:7.2f} ms")

    tiles = gather_only(img, origins)

    # 2. raw conv forward on the gathered batch (scan over sw-sized steps)
    @jax.jit
    def fwd_only(p, t):
        tt = t.reshape(-1, sw, roi, roi, 3)

        def body(_, tb):
            return None, model.apply(p, tb).astype(jnp.float32)

        _, out = jax.lax.scan(body, None, tt)
        return out.reshape(-1, roi, roi, 3)

    ms = timed(fwd_only, params, tiles)
    print(f"conv forward ({len(grid)} tiles):   {ms:7.2f} ms")

    logits = fwd_only(params, tiles)

    # 3. blend only (both canvases + division)
    @jax.jit
    def blend_only(lg):
        t = lg[:n_tiles].reshape(n_side, n_side, roi, roi, 3)
        acc = tiles_to_canvas(t, stride, roi, P, P)
        imp = jnp.ones((roi, roi, 1), jnp.float32)
        cnt = tiles_to_canvas(
            jnp.broadcast_to(imp, (n_side, n_side, roi, roi, 1)),
            stride, roi, P, P)
        return acc / jnp.maximum(cnt, 1e-8)

    ms = timed(blend_only, logits)
    print(f"blend (2x tiles_to_canvas):  {ms:7.2f} ms")

    blended = blend_only(logits)

    # 4. softmax + channel slice
    @jax.jit
    def soft_only(b):
        return jax.nn.softmax(b, axis=-1)[..., 1]

    ms = timed(soft_only, blended)
    print(f"softmax+slice:               {ms:7.2f} ms")

    # 5. the full fused stage as the bench jits it
    @jax.jit
    def stage(p, im):
        lg = sliding_window_inference(
            lambda pp, t: model.apply(pp, t), p, im, roi=roi,
            sw_batch=sw, overlap=overlap, out_channels=3)
        return jax.nn.softmax(lg, axis=-1)[..., 1]

    ms = timed(stage, params, img)
    print(f"FULL stage (fused jit):      {ms:7.2f} ms")

    # 6. full stage with the old fixed sw_batch=128 for the A/B
    @jax.jit
    def stage128(p, im):
        lg = sliding_window_inference(
            lambda pp, t: model.apply(pp, t), p, im, roi=roi,
            sw_batch=128, overlap=overlap, out_channels=3)
        return jax.nn.softmax(lg, axis=-1)[..., 1]

    ms = timed(stage128, params, img)
    print(f"FULL stage (fixed sw=128):   {ms:7.2f} ms")


if __name__ == "__main__":
    main()
