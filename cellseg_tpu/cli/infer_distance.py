"""CLI: distance-pipeline inference (KIT-GE `infer_neurips.py` capability).

Flags mirror the reference (infer_neurips.py:18-40 / infer.py:21-36):
th_cell / th_seed seeds+mask thresholds, scale, CLAHE, artifact
correction, merge post-processing.
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
    parser = argparse.ArgumentParser("Distance-pipeline inference")
    parser.add_argument("-i", "--input_path", required=True, type=str)
    parser.add_argument("-o", "--output_path", required=True, type=str)
    parser.add_argument("--model_path", required=True, type=str,
                        help="checkpoint dir with config.json sidecar")
    parser.add_argument("--checkpoint", default="best_model.ckpt")
    parser.add_argument("--th_cell", default=0.07, type=float)
    parser.add_argument("--th_seed", default=0.45, type=float)
    parser.add_argument("--scale", default=1.0, type=float)
    parser.add_argument("--apply_clahe", action="store_true")
    parser.add_argument("--artifact_correction", action="store_true")
    parser.add_argument("--apply_merging", action="store_true")
    parser.add_argument("--n_splitting", default=40, type=int,
                        help="3D stacks: min cell count that triggers "
                             "local-maxima re-seeding (reference "
                             "postprocessing.py:115-135)")
    parser.add_argument("--fuse_z_seeds", action="store_true",
                        help="3D stacks: fuse seeds across adjacent "
                             "z-slices (reference :137-141)")
    parser.add_argument("--cell_type", default="", type=str,
                        help="CTC cell type for FOI correction")
    parser.add_argument("--save_raw_pred", action="store_true",
                        help="also write raw cell/border predictions and "
                             "the tan-transformed border map (reference "
                             "inference.py:118-121)")
    parser.add_argument("--tile_threshold", default=0, type=int,
                        help="route images larger than this through the "
                             "MXU-batched 512-tile sliding-window forward "
                             "(3.1x the whole-image forward at 2048^2 — "
                             "BASELINE.md round 5); 0 keeps the "
                             "reference's whole-image semantics")
    args = parser.parse_args(argv)

    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()

    os.makedirs(args.output_path, exist_ok=True)
    from ..decode.distance import foi_correction
    from ..infer.distance_infer import (
        DistancePredictor,
        apply_merging,
        artifact_correction,
    )

    model, params, cfg = load_model_for_inference(
        args.model_path, args.checkpoint)
    predictor = DistancePredictor(
        lambda p, x: model.apply(p, x), params,
        th_cell=args.th_cell, th_seed=args.th_seed,
        use_clahe=args.apply_clahe, scale=args.scale,
        tile_threshold=args.tile_threshold,
    )

    results = {}
    for name in list_images(args.input_path):
        img = np.asarray(imread(join(args.input_path, name)))
        t0 = time.time()
        if img.ndim == 3 and img.shape[-1] > 4:
            # multipage z-stack (Z, H, W): slice-wise net + 3D decode
            labels = predictor.predict_volume(
                img, n_splitting=args.n_splitting,
                fuse_z_seeds=args.fuse_z_seeds)
        else:
            labels = predictor.predict(img)
            if args.apply_merging:
                labels = apply_merging(labels, predictor.last_border)
            if args.save_raw_pred:
                # reference writes cell{id}, raw_border{id} and the
                # tan-transformed border{id} (inference.py:118-121)
                from ..decode.distance import transform_border
                from ..io.images import imwrite
                stem = name.split(".")[0] + "_label.tiff"
                border_p, cell_p = predictor.last_raw
                imwrite(join(args.output_path, "cell" + stem),
                        cell_p.astype(np.float32))
                imwrite(join(args.output_path, "raw_border" + stem),
                        border_p.astype(np.float32))
                imwrite(join(args.output_path, "border" + stem),
                        np.asarray(transform_border(border_p)))
        if args.cell_type:
            labels = foi_correction(labels, args.cell_type)
        results[name] = labels
        print(f"inferred {name}: {labels.max()} cells, "
              f"{time.time() - t0:.2f}s")

    if args.artifact_correction:
        results = artifact_correction(results)

    for name, labels in results.items():
        stem = name.split(".")[0]
        imwrite_instance_tiff(join(args.output_path, stem + "_label.tiff"),
                              labels)

    from ..utils.hbm import maybe_record_hbm

    maybe_record_hbm()  # time_eval device-budget hook (no-op unless asked)


if __name__ == "__main__":
    main()
