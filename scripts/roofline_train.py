"""Train-step roofline honesty (VERDICT r5 item 7).

The scan-fused 3-class train step measured 2.7% MFU at the reference's
batch 8×256² config (model_training_3class.py:76-80). This script shows
WHERE that bound lives: it times the jitted fwd+bwd+AdamW step at batch 8
and at batch 64/128 (same model, same code), with XLA cost analysis per
variant. If MFU scales with batch the step is batch-shape-bound (the
reference fixes batch 8), not implementation-bound.

Run on the real chip: python scripts/roofline_train.py
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
import optax

from cellseg_tpu.models import build_model
from cellseg_tpu.train.losses import dice_ce_loss

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


def main():
    model = build_model("unet", num_class=3, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    params = jax.device_put(model.init(rng, x1))
    tx = optax.adamw(6e-4)
    opt_state = jax.device_put(tx.init(params))

    for B in (8, 32, 128):
        x = jax.random.normal(rng, (B, 256, 256, 3), jnp.float32)
        y = jax.random.randint(rng, (B, 256, 256), 0, 3)

        @jax.jit
        def step(p, o, xx, yy):
            def loss_fn(pp):
                return dice_ce_loss(model.apply(pp, xx), yy)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o2 = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o2, loss

        # K steps in one scan dispatch (same as --steps_per_dispatch)
        K = 10

        @jax.jit
        def scan_steps(p, o, xx, yy):
            def body(carry, _):
                pp, oo = carry
                pp, oo, loss = step_inner(pp, oo, xx, yy)
                return (pp, oo), loss

            def step_inner(pp, oo, xx, yy):
                def loss_fn(q):
                    return dice_ce_loss(model.apply(q, xx), yy)

                loss, grads = jax.value_and_grad(loss_fn)(pp)
                updates, oo2 = tx.update(grads, oo, pp)
                return optax.apply_updates(pp, updates), oo2, loss

            (p, o), losses = jax.lax.scan(body, (p, o), None, length=K)
            return p, o, losses

        try:
            ca = step.lower(params, opt_state, x, y).compile(
            ).cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            fl = float(ca.get("flops", 0.0))
            by = float(ca.get("bytes accessed", 0.0))
        except Exception:
            fl = by = 0.0

        out = scan_steps(params, opt_state, x, y)
        _sync(out[2])
        rtt = _rtt()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = scan_steps(params, opt_state, x, y)
            _sync(out[2])
            ts.append(((time.perf_counter() - t0) - rtt) * 1e3 / K)
        ms = float(np.median(ts))
        mfu = fl / (ms / 1e3) / PEAK_TFLOPS if fl else 0.0
        hbm = by / (ms / 1e3) / PEAK_HBM if by else 0.0
        ai = fl / by if by else 0.0
        print(f"B={B:4d}: {ms:7.2f} ms/step  {fl/1e9:7.1f} GF "
              f"{by/1e9:6.2f} GB  AI {ai:6.1f}  MFU {mfu*100:5.1f}%  "
              f"HBM {hbm*100:5.1f}%  "
              f"steps/s {1e3/ms:7.1f}  MP/s {B*256*256/1e6*1e3/ms:6.1f}")


if __name__ == "__main__":
    main()
