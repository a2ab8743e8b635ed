"""CLI: instance-F1 evaluation over a directory of segmentation results.

ABI parity with reference `compute_metric.py -g -s [--gt_suffix --seg_suffix
-thre -o -n --count_bd_cells]` (baseline/compute_metric.py:135-265):
per-image CSV columns, patch-based path for >25 MP images, printed
mean/median F1 per threshold.
"""

from __future__ import annotations

import argparse
import os
import traceback
from collections import OrderedDict

import numpy as np
import pandas as pd

from ..io import imread
from ..metrics import score_pair, score_pair_tiled

join = os.path.join


def main(argv=None):
    parser = argparse.ArgumentParser(
        "Compute F1 score for cell segmentation results", add_help=False
    )
    parser.add_argument("-g", "--gt_path", default="labelsTr_GT", type=str)
    parser.add_argument("-s", "--seg_path", type=str, default="", required=False)
    parser.add_argument("--gt_suffix", default=".tif", type=str)
    parser.add_argument("--seg_suffix", default="_label.tiff", type=str)
    parser.add_argument("-thre", "--thresholds", nargs="+", default=[0.5],
                        type=float)
    parser.add_argument("-o", "--output_path", default="./", type=str)
    parser.add_argument("-n", "--save_name", default="demo", type=str)
    parser.add_argument("--count_bd_cells", default=False, action="store_true")
    parser.add_argument("-h", "--help", action="help")
    args = parser.parse_args(argv)

    names = sorted(os.listdir(args.seg_path))
    names = [n for n in names if n.endswith(args.seg_suffix)]

    for threshold in args.thresholds:
        print("compute metrics at threshold:", threshold)
        metrics = OrderedDict(
            (k, [])
            for k in ["names", "true_num", "pred_num", "correct_num(TP)",
                      "missed_num(FN)", "wrong_num(FP)", "precision",
                      "recall", "dice", "F1"]
        )
        failed = []
        for name in names:
            try:
                gt_name = name.split(args.seg_suffix)[0] + args.gt_suffix
                gt = np.asarray(imread(join(args.gt_path, gt_name)))
                seg = np.asarray(imread(join(args.seg_path, name)))
                if np.prod(gt.shape) < 25_000_000:
                    s = score_pair(gt, seg, threshold=threshold,
                                   count_bd_cells=args.count_bd_cells)
                else:
                    s = score_pair_tiled(gt, seg, threshold=threshold,
                                         count_bd_cells=args.count_bd_cells)
                metrics["names"].append(name)
                metrics["true_num"].append(s["true_num"])
                metrics["pred_num"].append(s["pred_num"])
                metrics["correct_num(TP)"].append(s["tp"])
                metrics["missed_num(FN)"].append(s["fn"])
                metrics["wrong_num(FP)"].append(s["fp"])
                metrics["precision"].append(np.round(s["precision"], 4))
                metrics["recall"].append(np.round(s["recall"], 4))
                metrics["dice"].append(np.round(s["dice"], 4))
                metrics["F1"].append(np.round(s["f1"], 4))
            except Exception:
                print("!" * 20)
                print(name, "evaluation error!")
                traceback.print_exc()
                failed.append(name)

        df = pd.DataFrame(metrics)
        save_name = args.save_name
        if save_name.endswith(".csv"):
            save_name = save_name[:-4]
        os.makedirs(args.output_path, exist_ok=True)
        df.to_csv(join(args.output_path, f"{save_name}-{threshold}.csv"),
                  index=False)
        print("threshold:", threshold,
              "mean F1 Score:", np.mean(metrics["F1"]) if metrics["F1"] else 0.0,
              "median F1 Score:", np.median(metrics["F1"]) if metrics["F1"] else 0.0)
        print("failed cases:", failed)


if __name__ == "__main__":
    main()
