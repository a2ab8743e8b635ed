"""CLI: per-image running-time evaluation harness.

Capability parity with the reference's Docker-based timing harness
(baseline/cellseg_time_eval.py:23-97): iterate images one at a time, run
the submission command against a single-image input dir, measure wall
time, apply the organizers' rank-time tolerance (max(0, t − 10 s) for
≤ 1 MP, max(0, t − 10 s·MP) above, :78-82), verify the output naming
contract ({stem}_label.tiff, :84-89), and write a per-case CSV.

Instead of `docker container run --gpus ...` the harness executes a shell
command template (use {input} and {output} placeholders) — e.g. the
cellseg_tpu predictor itself, or any other submission entry point.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import time

import numpy as np
import pandas as pd

from ..io import imread, list_images

join = os.path.join


def rank_time(real_time: float, n_pixels: int) -> float:
    """Organizers' tolerance rule (cellseg_time_eval.py:78-82)."""
    mp = n_pixels / 1e6
    if mp <= 1:
        return max(0.0, real_time - 10.0)
    return max(0.0, real_time - 10.0 * mp)


def main(argv=None):
    parser = argparse.ArgumentParser("Per-image running-time evaluation")
    parser.add_argument("-i", "--test_images", required=True, type=str)
    parser.add_argument("-c", "--command", required=True, type=str,
                        help="shell command template with {input} {output}")
    parser.add_argument("-o", "--output_path", default="./time_eval", type=str)
    parser.add_argument("-n", "--save_name", default="running_time", type=str)
    parser.add_argument("--timeout", default=600, type=float)
    args = parser.parse_args(argv)

    os.makedirs(args.output_path, exist_ok=True)
    work_in = join(args.output_path, "inputs")
    work_out = join(args.output_path, "outputs")

    names = list_images(args.test_images)
    metrics = {"names": [], "real_running_time": [], "rank_running_time": [],
               "size_mp": [], "ok": []}
    for name in names:
        try:
            shutil.rmtree(work_in, ignore_errors=True)
            shutil.rmtree(work_out, ignore_errors=True)
            os.makedirs(work_in)
            os.makedirs(work_out)
            shutil.copy(join(args.test_images, name), join(work_in, name))
            img = np.asarray(imread(join(work_in, name)))
            n_px = int(np.prod(img.shape[:2]))

            cmd = args.command.format(input=work_in, output=work_out)
            t0 = time.time()
            subprocess.run(cmd, shell=True, check=True,
                           timeout=args.timeout)
            dt = time.time() - t0

            expected = name.split(".")[0] + "_label.tiff"
            ok = os.path.exists(join(work_out, expected))
            if not ok:
                print(f"!! {name}: missing output {expected}")
            metrics["names"].append(name)
            metrics["real_running_time"].append(round(dt, 2))
            metrics["rank_running_time"].append(round(rank_time(dt, n_px), 2))
            metrics["size_mp"].append(round(n_px / 1e6, 3))
            metrics["ok"].append(ok)
            print(f"{name}: {dt:.2f}s real, "
                  f"{rank_time(dt, n_px):.2f}s rank ({n_px/1e6:.2f} MP)")
        except Exception as e:  # defensive per-case guard, like the reference
            print(f"!! {name} failed: {e}")

    df = pd.DataFrame(metrics)
    df.to_csv(join(args.output_path, args.save_name + ".csv"), index=False)
    if metrics["rank_running_time"]:
        print(f"median rank time: {np.median(metrics['rank_running_time']):.2f}s")


if __name__ == "__main__":
    main()
