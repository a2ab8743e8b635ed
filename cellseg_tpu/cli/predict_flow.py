"""CLI: flow-field (cellpose-style) inference.

Capability parity with the reference's cellpose eval wrappers
(cellpose-omnipose-KIT-GE/test_cellpose_cyto2_grey.py:16-34): grey-convert,
run the flow model, gradient-tracking decode, write `{stem}_label.tiff`.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..io import imread, imwrite_instance_tiff, list_images
from ..train.checkpoint import load_model_for_inference

join = os.path.join


def main(argv=None):
    parser = argparse.ArgumentParser("Flow-field inference")
    parser.add_argument("-i", "--input_path", required=True, type=str)
    parser.add_argument("-o", "--output_path", required=True, type=str)
    parser.add_argument("--model_path", required=True, type=str)
    parser.add_argument("--checkpoint", default="best_model.ckpt")
    parser.add_argument("--prob_threshold", default=0.0, type=float)
    parser.add_argument("--n_iter", default=100, type=int)
    args = parser.parse_args(argv)

    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from ..decode.flow import decode_flow

    os.makedirs(args.output_path, exist_ok=True)
    model, params, _ = load_model_for_inference(args.model_path,
                                                args.checkpoint)

    jitted = {}

    def run(x):
        if x.shape not in jitted:
            @jax.jit
            def f(p, xx):
                flow, cellprob = model.apply(p, xx[None])
                return decode_flow(flow[0], cellprob[0, ..., 0],
                                   args.prob_threshold, args.n_iter)

            jitted[x.shape] = f
        return jitted[x.shape](params, jnp.asarray(x))

    for name in list_images(args.input_path):
        img = np.asarray(imread(join(args.input_path, name)))
        if img.ndim == 3:
            img = img.mean(axis=-1)
        lo, hi = float(img.min()), float(img.max())
        grey = ((img.astype(np.float32) - lo) / max(hi - lo, 1e-9))
        # pad to multiple of 32 for the conv strides
        h, w = grey.shape
        ph, pw = -(-h // 32) * 32, -(-w // 32) * 32
        padded = np.zeros((ph, pw, 1), np.float32)
        padded[:h, :w, 0] = grey
        t0 = time.time()
        labels = np.asarray(run(padded))[:h, :w]
        stem = name.split(".")[0]
        imwrite_instance_tiff(join(args.output_path, stem + "_label.tiff"),
                              labels)
        print(f"{name}: {labels.max()} cells, {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
