"""Instrumentation: per-propagation iteration counts + stage timing for the
3-class fused-region decode at 4.2 MP (VERDICT r4 item 1 groundwork).

Run on the real chip: python scripts/profile_decode.py
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
from cellseg_tpu.ops.cc import (
    _INF,
    _propagate,
    _propagate_region,
    region_roots,
    sequential_from_ranks,
)
from cellseg_tpu.ops.rank_areas import dense_region_ranks, small_mask_guarded


def _sync(out):
    """Force remote materialization (block_until_ready returns at enqueue
    on the axon tunnel): fetch a scalar that depends on the output."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32) if leaf.dtype != jnp.float32
                         else leaf))


def _rtt():
    """Median sync RTT (tiny independent program + scalar fetch)."""
    tiny = jnp.zeros((8,), jnp.float32)
    _sync(tiny)
    rs = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tiny)
        rs.append(time.perf_counter() - t0)
    return float(np.median(rs))


def timed(fn, *args, n=20, rounds=5):
    _sync(fn(*args))
    rtt = _rtt()
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        _sync(outs[-1])
        ts.append(((time.perf_counter() - t0) - rtt) * 1e3 / n)
    return float(np.median(ts))


def iter_count_region(lab, m, max_iters=1024):
    """Replicate _propagate_region but return the iteration count."""
    from cellseg_tpu.ops.cc import _scan_rows_cols_region

    def body(state):
        lab, _, it = state
        new = _scan_rows_cols_region(lab, m)
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    state = jax.lax.while_loop(cond, body, (lab, jnp.bool_(True), jnp.int32(0)))
    return state[0], state[2]


def iter_count_prop(lab, mask, connectivity, max_iters=1024):
    from cellseg_tpu.ops.cc import _cheap_body

    def body(state):
        lab, _, it = state
        new = _cheap_body(lab, mask, connectivity)
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    state = jax.lax.while_loop(cond, body, (lab, jnp.bool_(True), jnp.int32(0)))
    return state[0], state[2]


def real_prob(img):
    """The bench pipeline's actual decode input: trained bf16 UNet
    sliding-window forward + softmax interior channel (bench.py:main)."""
    from flax import serialization

    from cellseg_tpu.infer.sliding_window import sliding_window_inference
    from cellseg_tpu.models import build_model
    from cellseg_tpu.pipeline.normalize import normalize_image_jax
    from cellseg_tpu.train.checkpoint import load_checkpoint

    model = build_model("unet", num_class=3, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 256, 256, 3), jnp.float32))
    payload = load_checkpoint(os.path.join(REPO, "assets",
                                           "bench_unet_3class.ckpt"))
    params = jax.device_put(
        serialization.from_state_dict(params, payload["params"]))

    @jax.jit
    def fwd(p, u8):
        norm = normalize_image_jax(u8).astype(jnp.float32)
        norm = jnp.repeat(norm, 3, axis=-1)
        x = norm / jnp.maximum(jnp.max(norm), 1e-8)
        logits = sliding_window_inference(
            lambda pp, t: model.apply(pp, t), p, x, roi=256,
            sw_batch=128, overlap=0.25, out_channels=3)
        return jax.nn.softmax(logits, axis=-1)[..., 1]

    return fwd(params, jnp.asarray(img[..., None]))


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    H = int(pos[0]) if pos else 2048
    img = make_slide(H, H, n_cells=2000 * (H * H) // (2048 * 2048))
    if "--real" in sys.argv:
        prob = real_prob(img)
        print("input: trained-model softmax (bench-identical)")
    else:
        prob = jnp.asarray(
            (img.astype(np.float32) - 30.0) / 150.0).clip(0, 1)
    mask = prob > 0.5

    # --- stage 1: region_roots (fused object+background propagation)
    lin = jnp.arange(H * H, dtype=jnp.int32).reshape(H, H)
    mi = mask.astype(jnp.int32)
    f1 = jax.jit(lambda l, m: iter_count_region(l, m))
    roots, n1 = f1(lin, mi)
    print(f"region_roots: {int(n1)} iters, {timed(f1, lin, mi):.1f} ms")

    # --- stage 2: dense ranks (MXU histogram)
    f2 = jax.jit(lambda r, m: dense_region_ranks(r, m))
    dense, r_plane, k_total = f2(roots, mi)
    print(f"dense_region_ranks: {timed(f2, roots, mi):.1f} ms, k={int(k_total)}")

    # --- stage 3: small masks (hole fill)
    inv = jnp.logical_not(mask)
    f3 = jax.jit(lambda d, k, i: small_mask_guarded(d, k, i, 64))
    small_bg = f3(dense, k_total, inv)
    print(f"small_mask_guarded(bg,64): {timed(f3, dense, k_total, inv):.1f} ms")
    filled = jnp.logical_or(mask, small_bg)

    # --- stage 4: merge propagation across filled holes
    lab0 = jnp.where(filled, dense, _INF)
    f4 = jax.jit(lambda l, m: iter_count_prop(l, m, 1))
    merged, n4 = f4(lab0, filled)
    print(f"merge prop (4conn): {int(n4)} iters, {timed(f4, lab0, filled):.1f} ms")

    # --- stage 5: small objects
    f5 = jax.jit(lambda d, k, m: small_mask_guarded(d, k, m, 16))
    small = f5(merged, k_total, filled)
    print(f"small_mask_guarded(obj,16): {timed(f5, merged, k_total, filled):.1f} ms")
    mask2 = jnp.logical_and(filled, ~small)

    # --- stage 6: final 8-conn propagation
    lab1 = jnp.where(mask2, merged, _INF)
    f6 = jax.jit(lambda l, m: iter_count_prop(l, m, 2))
    lab, n6 = f6(lab1, mask2)
    print(f"final prop (8conn): {int(n6)} iters, {timed(f6, lab1, mask2):.1f} ms")

    # --- stage 7: sequential relabel (one more seeded propagation)
    f7 = jax.jit(lambda l, rp, r, m: sequential_from_ranks(l, rp, r, m, 2))
    out = f7(lab, r_plane, roots, mask2)
    print(f"sequential_from_ranks: {timed(f7, lab, r_plane, roots, mask2):.1f} ms")
    print(f"instances: {int(out.max())}")

    # total for comparison
    from cellseg_tpu.decode.threeclass import decode_interior_prob
    print(f"full decode_interior_prob: {timed(decode_interior_prob, prob):.1f} ms")


if __name__ == "__main__":
    main()
