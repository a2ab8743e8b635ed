"""Real-microscopy quality anchor: leave-one-out on the 3 bundled images.

The only real labeled data available offline is the reference's 3 bundled
(image, instance-label) pairs (/root/reference/data/Train_Labeled —
cell_00225 1024² RGB, cell_00528 200² uint16, cell_00849 512² RGB; three
different modalities). For each rotation this trains on 2 images and
scores the held-out 3rd through the REAL CLIs, for the 3-class UNet and
the distance pipeline (VERDICT r2 item 6). It also measures the
device-vs-host watershed decode ΔF1 on the trained distance predictions
(VERDICT r2 item 2's trained-checkpoint audit).

Usage: python scripts/real_data_anchor.py --out /tmp/anchor
Writes <out>/anchor.json; numbers are recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DATA = "/root/reference/data/Train_Labeled"
NAMES = ["cell_00225.png", "cell_00528.tif", "cell_00849.png"]


def run(cmd: list[str]) -> None:
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def best_ckpt(model_dir: str) -> str:
    for name in ("best_model.ckpt", "final_model.ckpt"):
        if os.path.exists(os.path.join(model_dir, name)):
            return name
    raise FileNotFoundError(f"no checkpoint in {model_dir}")


def f1_of(gt_dir: str, seg_dir: str, out_dir: str) -> float:
    run([sys.executable, "-m", "cellseg_tpu.cli.compute_metric",
         "-g", gt_dir, "-s", seg_dir,
         "--gt_suffix", "_label.tiff", "--seg_suffix", "_label.tiff",
         "-o", out_dir, "-n", "val"])
    import pandas as pd

    df = pd.read_csv(os.path.join(out_dir, "val-0.5.csv"))
    return float(df["F1"].mean())


def stage_rotation(out: str, holdout: str) -> tuple[str, str]:
    """train/ holds the other two pairs; test/ holds the holdout."""
    rot = os.path.join(out, f"rot_{holdout.split('.')[0]}")
    for sub in ("train/images", "train/labels", "test/images",
                "test/labels"):
        os.makedirs(os.path.join(rot, sub), exist_ok=True)
    for n in NAMES:
        stem = n.split(".")[0]
        dst = "test" if n == holdout else "train"
        shutil.copy(os.path.join(DATA, "images", n),
                    os.path.join(rot, dst, "images", n))
        shutil.copy(os.path.join(DATA, "labels", f"{stem}_label.tiff"),
                    os.path.join(rot, dst, "labels", f"{stem}_label.tiff"))
    return os.path.join(rot, "train"), os.path.join(rot, "test")


def decode_delta_f1(model_dir: str, test_images: str) -> dict:
    """Device vs host watershed decode on the SAME trained distance
    predictions: pixel agreement and instance-F1 between the two decodes
    (the tie-behavior audit on real trained outputs)."""
    import numpy as np

    from cellseg_tpu.decode.distance import _seeds_and_mask
    from cellseg_tpu.infer.distance_infer import DistancePredictor
    from cellseg_tpu.metrics.f1 import eval_tp_fp_fn
    from cellseg_tpu.ops.watershed import watershed_host, watershed_jax
    from cellseg_tpu.train.checkpoint import load_model_for_inference

    import jax
    import jax.numpy as jnp

    model, params, _ = load_model_for_inference(model_dir,
                                                best_ckpt(model_dir))
    pred = DistancePredictor(
        lambda p, x: model.apply(p, x), params)
    out = {}
    from cellseg_tpu.io import imread, list_images

    for name in list_images(test_images):
        img = np.asarray(imread(os.path.join(test_images, name)))
        border, cell = pred.predict_raw(img)
        cell_s, mask, seeds = _seeds_and_mask(
            jnp.asarray(cell), jnp.asarray(border),
            jnp.float32(0.07), jnp.float32(0.45))
        dev = np.asarray(jax.device_get(
            watershed_jax(-cell_s, seeds, mask)))
        host = watershed_host(np.asarray(jax.device_get(-cell_s)),
                              np.asarray(jax.device_get(seeds)),
                              np.asarray(jax.device_get(mask)))
        m = np.asarray(jax.device_get(mask))
        agree = float((dev[m] == host[m]).mean()) if m.any() else 1.0
        tp, fp, fn = eval_tp_fp_fn(host, dev, threshold=0.5)
        f1 = 2 * tp / max(2 * tp + fp + fn, 1)
        out[name] = {"pixel_agreement_in_mask": agree,
                     "instance_f1_dev_vs_host": f1}
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/cellseg_real_anchor")
    p.add_argument("--epochs3c", type=int, default=300)
    p.add_argument("--epochs_dist", type=int, default=320)
    p.add_argument("--pipelines", nargs="+", default=["3class", "distance"])
    p.add_argument("--rotations", nargs="+", default=NAMES)
    args = p.parse_args()

    results = {"3class": {}, "3class_watershed": {}, "distance": {},
               "decode_delta": {}}
    for holdout in args.rotations:
        key = holdout.split(".")[0]
        train, test = stage_rotation(args.out, holdout)
        rot = os.path.dirname(train)

        if "3class" in args.pipelines:
            pre = os.path.join(rot, "train_pre")
            if not os.path.isdir(pre):
                run([sys.executable, "-m",
                     "cellseg_tpu.cli.pre_process_3class",
                     "-i", train, "-o", pre])
            wd = os.path.join(rot, "wd3c")
            model_dir = os.path.join(wd, "unet_3class")
            if not os.path.exists(os.path.join(model_dir,
                                               "final_model.ckpt")):
                run([sys.executable, "-m", "cellseg_tpu.cli.train",
                     "--data_path", pre, "--work_dir", wd,
                     "--max_epochs", str(args.epochs3c),
                     "--min_val_epoch", "4", "--epoch_tolerance", "60",
                     "--batch_size", "4"])
            for decode, rkey in (("cc", "3class"),
                                 ("boundary_watershed",
                                  "3class_watershed")):
                seg = os.path.join(rot, f"seg3c_{decode}")
                run([sys.executable, "-m", "cellseg_tpu.cli.predict",
                     "-i", os.path.join(test, "images"), "-o", seg,
                     "--model_path", model_dir,
                     "--checkpoint", best_ckpt(model_dir),
                     "--decode", decode])
                results[rkey][key] = f1_of(
                    os.path.join(test, "labels"), seg,
                    os.path.join(rot, f"m3c_{decode}"))

        if "distance" in args.pipelines:
            wd = os.path.join(rot, "wdd")
            model_dir = os.path.join(wd, "dunet_distance")
            if not os.path.exists(os.path.join(model_dir,
                                               "best_model.ckpt")):
                run([sys.executable, "-m",
                     "cellseg_tpu.cli.train_distance",
                     "--data_path", train, "--work_dir", wd,
                     "--crop_size", "256",
                     "--max_epochs", str(args.epochs_dist)])
            seg = os.path.join(rot, "segd")
            run([sys.executable, "-m", "cellseg_tpu.cli.infer_distance",
                 "-i", os.path.join(test, "images"), "-o", seg,
                 "--model_path", model_dir])
            results["distance"][key] = f1_of(
                os.path.join(test, "labels"), seg, os.path.join(rot, "md"))
            results["decode_delta"][key] = decode_delta_f1(
                model_dir, os.path.join(test, "images"))

        with open(os.path.join(args.out, "anchor.json"), "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps({key: {k: results[k].get(key)
                                for k in results}}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
