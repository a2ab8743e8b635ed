"""End-to-end learning-stack validation on the synthetic dataset.

Generates the synthetic set (make_synthetic_dataset.py), trains each of
the three pipelines from scratch through their real CLIs, runs their real
inference CLIs on the held-out split, and scores instance F1 — the
numbers quoted in BASELINE.md §"Learning-stack validation".

Usage:
  python scripts/validate_quality.py --out /tmp/qual [--epochs3c 120]
      [--pipelines 3class distance flow]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(cmd: list[str]) -> None:
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def best_ckpt(model_dir: str) -> str:
    """best_model.ckpt, falling back to final_model.ckpt (short runs may
    never clear the validation gate)."""
    for name in ("best_model.ckpt", "final_model.ckpt"):
        if os.path.exists(os.path.join(model_dir, name)):
            return name
    raise FileNotFoundError(f"no checkpoint in {model_dir}")


def mean_f1(gt_dir: str, seg_dir: str, out_dir: str) -> float:
    run([sys.executable, "-m", "cellseg_tpu.cli.compute_metric",
         "-g", gt_dir, "-s", seg_dir,
         "--gt_suffix", "_label.tiff", "--seg_suffix", "_label.tiff",
         "-o", out_dir, "-n", "val"])
    import pandas as pd

    df = pd.read_csv(os.path.join(out_dir, "val-0.5.csv"))
    return float(df["F1"].mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/cellseg_quality")
    p.add_argument("--n_images", type=int, default=40)
    p.add_argument("--epochs3c", type=int, default=120)
    p.add_argument("--epochs_dist", type=int, default=None,
                   help="None = dataset-scaled default (get_max_epochs)")
    p.add_argument("--epochs_flow", type=int, default=60)
    p.add_argument("--pipelines", nargs="+",
                   default=["3class", "distance", "flow"])
    args = p.parse_args()

    out = args.out
    train = os.path.join(out, "train")
    test = os.path.join(out, "test")
    if not os.path.isdir(train):
        run([sys.executable, os.path.join(HERE, "make_synthetic_dataset.py"),
             "-o", out, "-n", str(args.n_images)])

    results = {}

    if "3class" in args.pipelines:
        pre = os.path.join(out, "train_pre")
        if not os.path.isdir(pre):
            run([sys.executable, "-m", "cellseg_tpu.cli.pre_process_3class",
                 "-i", train, "-o", pre])
        wd = os.path.join(out, "wd3c")
        model_dir = os.path.join(wd, "unet_3class")
        if not os.path.exists(os.path.join(model_dir, "final_model.ckpt")):
            run([sys.executable, "-m", "cellseg_tpu.cli.train",
                 "--data_path", pre, "--work_dir", wd,
                 "--max_epochs", str(args.epochs3c),
                 "--min_val_epoch", "4", "--epoch_tolerance", "30"])
        seg = os.path.join(out, "seg3c")
        run([sys.executable, "-m", "cellseg_tpu.cli.predict",
             "-i", os.path.join(test, "images"), "-o", seg,
             "--model_path", model_dir,
             "--checkpoint", best_ckpt(model_dir)])
        results["3class"] = mean_f1(os.path.join(test, "labels"), seg,
                                    os.path.join(out, "m3c"))

    if "distance" in args.pipelines:
        wd = os.path.join(out, "wdd")
        model_dir = os.path.join(wd, "dunet_distance")
        if not os.path.exists(os.path.join(model_dir, "best_model.ckpt")):
            cmd = [sys.executable, "-m", "cellseg_tpu.cli.train_distance",
                   "--data_path", train, "--work_dir", wd,
                   "--crop_size", "320"]
            if args.epochs_dist:
                cmd += ["--max_epochs", str(args.epochs_dist)]
            run(cmd)
        seg = os.path.join(out, "segd")
        run([sys.executable, "-m", "cellseg_tpu.cli.infer_distance",
             "-i", os.path.join(test, "images"), "-o", seg,
             "--model_path", model_dir])
        results["distance"] = mean_f1(os.path.join(test, "labels"), seg,
                                      os.path.join(out, "md"))

    if "flow" in args.pipelines:
        wd = os.path.join(out, "wdf")
        model_dir = os.path.join(wd, "flownet_flow")
        if not os.path.exists(os.path.join(model_dir, "best_model.ckpt")):
            run([sys.executable, "-m", "cellseg_tpu.cli.train_flow",
                 "--data_path", train, "--work_dir", wd,
                 "--max_epochs", str(args.epochs_flow)])
        seg = os.path.join(out, "segf")
        run([sys.executable, "-m", "cellseg_tpu.cli.predict_flow",
             "-i", os.path.join(test, "images"), "-o", seg,
             "--model_path", model_dir, "--diameter", "off"])
        results["flow"] = mean_f1(os.path.join(test, "labels"), seg,
                                  os.path.join(out, "mf"))

    print(json.dumps({"held_out_instance_f1": results}))
    with open(os.path.join(out, "quality.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
