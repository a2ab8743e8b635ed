"""CLI: distance-pipeline evaluation sweeper (KIT-GE `eval.py` capability).

Grid-sweeps th_seed × th_cell over a labeled set, scores each setting with
CTC SEG/DET/OP_CSB (reference eval.py:140-243), appends to metrics.csv
with dedup (:246-256), reports the best setting (utils.get_best_model) and
copies the best model + sidecar with the winning settings embedded
(utils.copy_best_model, utils.py:118-148).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np
import pandas as pd

from ..io import imread, list_images
from ..metrics.ctc import ctc_scores
from ..train.checkpoint import load_model_for_inference

join = os.path.join


def main(argv=None):
    parser = argparse.ArgumentParser("Distance-pipeline threshold sweep")
    parser.add_argument("--data_path", required=True, type=str,
                        help="dir with images/ and labels/")
    parser.add_argument("--model_path", required=True, type=str)
    parser.add_argument("--checkpoint", default="best_model.ckpt")
    parser.add_argument("--th_seed", nargs="+", type=float,
                        default=[0.35, 0.45])
    parser.add_argument("--th_cell", nargs="+", type=float, default=[0.07])
    parser.add_argument("--apply_clahe", action="store_true")
    parser.add_argument("--artifact_correction", action="store_true")
    parser.add_argument("--apply_merging", action="store_true")
    parser.add_argument("--scale", default=1.0, type=float)
    parser.add_argument("-o", "--output_path", default="./", type=str)
    parser.add_argument("--copy_best", default=None, type=str,
                        help="copy the best model + settings sidecar here "
                             "(reference utils.copy_best_model)")
    args = parser.parse_args(argv)

    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from ..infer.distance_infer import (DistancePredictor,
                                        apply_merging, artifact_correction)

    model, params, _ = load_model_for_inference(args.model_path,
                                                args.checkpoint)
    img_dir = join(args.data_path, "images")
    lbl_dir = join(args.data_path, "labels")
    names = list_images(img_dir)

    rows = []
    for th_seed in args.th_seed:
        for th_cell in args.th_cell:
            pred = DistancePredictor(
                lambda p, x: model.apply(p, x), params,
                th_cell=th_cell, th_seed=th_seed,
                use_clahe=args.apply_clahe, scale=args.scale,
            )
            preds = {}
            for name in names:
                img = np.asarray(imread(join(img_dir, name)))
                labels = pred.predict(img)
                if args.apply_merging:
                    labels = apply_merging(labels, pred.last_border)
                preds[name] = labels
            if args.artifact_correction:
                preds = artifact_correction(preds)
            segs, dets = [], []
            for name in names:
                stem = name.split(".")[0]
                gt = np.asarray(imread(join(lbl_dir, stem + "_label.tiff")))
                s = ctc_scores(gt.astype(np.int64),
                               preds[name].astype(np.int64))
                segs.append(s["SEG"])
                dets.append(s["DET"])
            seg, det = float(np.mean(segs)), float(np.mean(dets))
            rows.append({
                "model": args.model_path, "th_seed": th_seed,
                "th_cell": th_cell, "SEG": round(seg, 4),
                "DET": round(det, 4), "OP_CSB": round((seg + det) / 2, 4),
            })
            print(rows[-1])

    df = pd.DataFrame(rows)
    os.makedirs(args.output_path, exist_ok=True)
    csv_path = join(args.output_path, "metrics.csv")
    if os.path.exists(csv_path):
        old = pd.read_csv(csv_path)
        df = pd.concat([old, df]).drop_duplicates(
            subset=["model", "th_seed", "th_cell"], keep="last")
    df.to_csv(csv_path, index=False)
    best = df.loc[df["OP_CSB"].idxmax()]
    print(f"best: th_seed={best['th_seed']} th_cell={best['th_cell']} "
          f"OP_CSB={best['OP_CSB']}")

    if args.copy_best:
        copy_best_model(
            str(best["model"]), args.checkpoint, args.copy_best,
            {"th_seed": float(best["th_seed"]),
             "th_cell": float(best["th_cell"]),
             "apply_clahe": bool(args.apply_clahe),
             "artifact_correction": bool(args.artifact_correction),
             "apply_merging": bool(args.apply_merging),
             "scale_factor": float(args.scale),
             "OP_CSB": float(best["OP_CSB"]),
             "SEG": float(best["SEG"]), "DET": float(best["DET"])})


def copy_best_model(model_path: str, checkpoint: str, dest_dir: str,
                    best_settings: dict) -> None:
    """Copy the winning checkpoint + config sidecar into dest_dir and embed
    the winning post-processing settings in the sidecar
    (reference utils.copy_best_model, utils.py:118-148)."""
    os.makedirs(dest_dir, exist_ok=True)
    shutil.copy(join(model_path, checkpoint), join(dest_dir, checkpoint))
    cfg_path = join(model_path, "config.json")
    cfg = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
    cfg["best_settings"] = best_settings
    with open(join(dest_dir, "config.json"), "w", encoding="utf-8") as f:
        json.dump(cfg, f, ensure_ascii=False, indent=2)
    print(f"best model copied to {dest_dir} (settings embedded)")


if __name__ == "__main__":
    main()
