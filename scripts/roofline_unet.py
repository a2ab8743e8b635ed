"""Per-level roofline of the flagship 3-class UNet forward (VERDICT r5
item 2): time each encoder/decoder level in isolation at the bench batch,
compute analytic FLOPs/bytes from XLA cost analysis, and report where each
level sits against the v5e MXU (197 TFLOP/s bf16) and HBM (819 GB/s)
roofs.

Run on the real chip: python scripts/roofline_unet.py [batch]
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

from cellseg_tpu.models.blocks import ResidualUnit
from cellseg_tpu.models.unet import UNet

PEAK_TFLOPS = 197e12
PEAK_HBM = 819e9


def cost(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0))
    except Exception as e:  # pragma: no cover
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        return None, None


def _sync(out):
    """Force remote materialization (block_until_ready returns at enqueue
    on the axon tunnel)."""
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


def timed_chain(fn, *args, n=20, rounds=5):
    _sync(fn(*args))
    rtt = _rtt()
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        _sync(outs[-1])
        ts.append(((time.perf_counter() - t0) - rtt) * 1e3 / n)
    return float(np.median(ts))


def report(name, ms, fl, by):
    mfu = fl / (ms / 1e3) / PEAK_TFLOPS if fl else 0.0
    hbm = by / (ms / 1e3) / PEAK_HBM if by else 0.0
    ai = fl / by if (fl and by) else 0.0
    bound = "compute" if ai > PEAK_TFLOPS / PEAK_HBM else "memory"
    print(f"{name:28s} {ms:8.2f} ms  {fl/1e9:8.1f} GF {by/1e9:7.2f} GB  "
          f"AI {ai:6.1f}  MFU {mfu*100:5.1f}%  HBM {hbm*100:5.1f}%  "
          f"[{bound}-bound]")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    # full forward at the bench's sliding-window batch
    model = UNet(dtype=dt)
    x = jax.random.normal(rng, (B, 256, 256, 3), dt)
    params = jax.jit(model.init)(rng, x[:1])
    fwd = jax.jit(lambda p, xx: model.apply(p, xx))
    fl, by = cost(fwd, params, x)
    ms = timed_chain(fwd, params, x, n=5)
    report(f"full UNet fwd B={B}", ms, fl, by)
    print()

    # encoder levels in isolation (shapes as seen inside the forward)
    chans = (16, 32, 64, 128, 256)
    res = 256
    cin = 3
    for i, c in enumerate(chans):
        stride = 1 if i == len(chans) - 1 else 2
        blk = ResidualUnit(features=c, strides=stride, subunits=2,
                           norm="instance", act="prelu", dtype=dt)
        xi = jax.random.normal(rng, (B, res, res, cin), dt)
        p = jax.jit(blk.init)(rng, xi[:1])
        f = jax.jit(lambda pp, aa, blk=blk: blk.apply(pp, aa))
        fl, by = cost(f, p, xi)
        ms = timed_chain(f, p, xi, n=5)
        report(f"enc L{i} {res}^2 {cin}->{c} s{stride}", ms, fl, by)
        cin = c
        if stride == 2:
            res //= 2

    # decoder levels (concat -> convtranspose -> res unit), approximated by
    # the dominant convtranspose + res unit pair
    from flax import linen as nn

    res = 16
    up_in = (256 + 128, 128 + 64, 64 + 32, 32 + 16)
    up_out = (128, 64, 32, 3)
    for i in range(4):
        cin, cout = up_in[i], up_out[i]

        class Dec(nn.Module):
            @nn.compact
            def __call__(self, a):
                a = nn.ConvTranspose(cout, (3, 3), strides=(2, 2),
                                     padding="SAME", dtype=dt)(a)
                a = ResidualUnit(features=cout, strides=1, subunits=1,
                                 norm="instance", act="prelu",
                                 dtype=dt)(a)
                return a

        blk = Dec()
        xi = jax.random.normal(rng, (B, res, res, cin), dt)
        p = jax.jit(blk.init)(rng, xi[:1])
        f = jax.jit(lambda pp, aa, blk=blk: blk.apply(pp, aa))
        fl, by = cost(f, p, xi)
        ms = timed_chain(f, p, xi, n=5)
        report(f"dec L{3-i} {res}^2 {cin}->{cout}", ms, fl, by)
        res *= 2


if __name__ == "__main__":
    main()
