"""A/B microbench: gather-free bounded-window flow tracking ("propagate")
vs pointer doubling on a realistic 4.2 MP flow field (same generator as
bench.py --pipeline flow).

Run on the real chip: python scripts/flow_decode_ab.py
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
from cellseg_tpu.decode.flow import decode_flow
from cellseg_tpu.pipeline.flow_labels import masks_to_flows


def main(H: int = 2048, rounds: int = 5):
    W = H
    n_cells = max(8, int(1200 * (H * W) / (2048 * 2048)))
    _, labels = make_slide(H, W, n_cells=n_cells, seed=0, return_labels=True)
    flows, mask = masks_to_flows(labels)
    flow_d = jnp.asarray(np.moveaxis(flows, 0, -1).astype(np.float32))
    prob_d = jnp.asarray(np.where(mask, 8.0, -8.0).astype(np.float32))

    sync = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))

    def timed(fn):
        fn()  # compile
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            out = fn()
            float(jax.device_get(sync(out)))  # force remote materialization
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(ts))

    rtt = timed(lambda: prob_d)
    results = {}
    for m in ("doubling", "propagate"):
        ms = timed(lambda m=m: decode_flow(flow_d, prob_d, method=m))
        out = np.asarray(decode_flow(flow_d, prob_d, method=m))
        results[m] = (ms, int(out.max()))
        print(f"{m:10s}: {ms:8.1f} ms gross, {ms - rtt:8.1f} ms net, "
              f"{results[m][1]} instances")
    print(f"sync RTT: {rtt:.1f} ms")

    # label agreement up to permutation on overlap
    a = np.asarray(decode_flow(flow_d, prob_d, method="doubling"))
    b = np.asarray(decode_flow(flow_d, prob_d, method="propagate"))
    both = (a > 0) & (b > 0)
    print(f"fg IoU-ish overlap: {both.sum() / max((a > 0).sum(), 1):.4f}, "
          f"instance counts {results['doubling'][1]} vs "
          f"{results['propagate'][1]}")


if __name__ == "__main__":
    main()
