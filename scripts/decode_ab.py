"""A/B microbench: fused-region 3-class decode vs the round-3 two-pass
decode on a realistic 4.2 MP synthetic slide (same generator as bench.py).

Run on the real chip: python scripts/decode_ab.py
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

from bench import make_slide
from cellseg_tpu.decode.threeclass import decode_interior_prob
from cellseg_tpu.ops.cc import (
    _INF,
    _propagate,
    _root_labels,
    region_roots,
    remove_small_holes_jax,
    sequential_from_roots,
    small_component_mask_by_sort,
)


@jax.jit
def decode_old(prob_interior: jax.Array) -> jax.Array:
    """Round-3 decode: separate hole pass + object pass (for A/B only)."""
    mask = prob_interior > 0.5
    mask = remove_small_holes_jax(mask, area_threshold=64, connectivity=1)
    roots4 = _root_labels(mask, connectivity=1)
    small = small_component_mask_by_sort(
        roots4.ravel(), mask.ravel(), 16).reshape(mask.shape)
    mask2 = jnp.logical_and(mask, ~small)
    lab0 = jnp.where(mask2, roots4, _INF)
    lab = _propagate(lab0, mask2, connectivity=2, max_iters=1024)
    return sequential_from_roots(lab, mask2, connectivity=2)


def bench(fn, *args, n=10):
    fn(*args).block_until_ready()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), float(np.min(ts))


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    img = make_slide(H, H, n_cells=2000 * (H * H) // (2048 * 2048))
    # interior-probability surrogate: eroded bright disks, like bench.py
    prob = jnp.asarray((img.astype(np.float32) - 30.0) / 150.0).clip(0, 1)

    a = np.asarray(decode_old(prob))
    b = np.asarray(decode_interior_prob(prob))
    assert np.array_equal(a, b), "fused decode is not bit-identical!"
    print(f"parity OK: {a.max()} instances at {H}x{H}")

    med_o, min_o = bench(decode_old, prob)
    med_n, min_n = bench(decode_interior_prob, prob)
    print(f"old  decode: median {med_o:.1f} ms  min {min_o:.1f} ms")
    print(f"new  decode: median {med_n:.1f} ms  min {min_n:.1f} ms")
    print(f"speedup: {med_o / med_n:.2f}x")


if __name__ == "__main__":
    main()
