"""DUNet whole-image forward roofline (distance pipeline's dominant cost).

The bench measures the bf16 DUNet forward at ~75 ms for a 2048² input
(1.98 TFLOP → 13.5% MFU). This probe: (a) XLA cost analysis + chained
timing of the whole-image forward, (b) the same forward tiled 512² with
balanced batches, (c) per-resolution ConvBlock isolation — to tell
whether the gap is memory shape (full-res 64-channel activations) or
MXU underfill, and whether tiling pays.

Run on the real chip: python scripts/roofline_dunet.py
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

from cellseg_tpu.models import build_model

PEAK_TFLOPS = 197e12
PEAK_HBM = 819e9


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


def timed(fn, *args, n=5, rounds=5):
    _sync(fn(*args))
    rtt = _rtt()
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        _sync(outs[-1])
        ts.append(((time.perf_counter() - t0) - rtt) * 1e3 / n)
    return float(np.median(ts))


def cost(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def report(name, ms, fl, by):
    mfu = fl / (ms / 1e3) / PEAK_TFLOPS if fl else 0.0
    hbm = by / (ms / 1e3) / PEAK_HBM if by else 0.0
    ai = fl / by if (fl and by) else 0.0
    print(f"{name:34s} {ms:8.2f} ms {fl/1e12:6.2f} TF {by/1e9:6.2f} GB "
          f"AI {ai:6.1f} MFU {mfu*100:5.1f}% HBM {hbm*100:5.1f}%")


def main():
    H = 2048
    model = build_model("dunet", dtype=jnp.bfloat16)
    params = jax.device_put(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1), jnp.float32)))
    x = jnp.asarray(np.random.RandomState(0).rand(1, H, H, 1), jnp.float32)

    @jax.jit
    def fwd(p, xx):
        border, cell = model.apply(p, xx)
        return border[0, ..., 0] + cell[0, ..., 0]

    fl, by = cost(fwd, params, x)
    ms = timed(fwd, params, x)
    report(f"whole-image {H}^2", ms, fl, by)

    # tiled: 512-tile grid, non-overlapping (roofline probe, not parity)
    roi = 512
    nt = H // roi

    @jax.jit
    def fwd_tiled(p, xx):
        tiles = xx[0].reshape(nt, roi, nt, roi, 1).transpose(
            0, 2, 1, 3, 4).reshape(nt * nt, roi, roi, 1)
        border, cell = model.apply(p, tiles)
        return jnp.sum(border) + jnp.sum(cell)

    fl2, by2 = cost(fwd_tiled, params, x)
    ms2 = timed(fwd_tiled, params, x)
    report(f"tiled {nt*nt}x{roi}^2 batch", ms2, fl2, by2)


if __name__ == "__main__":
    main()
