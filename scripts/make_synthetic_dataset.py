"""Generate a synthetic microscopy-like dataset (NeurIPS CellSeg format).

Elliptical cells with intensity variation, touching clusters, background
noise, and multiple 'modalities' (bright-on-dark / dark-on-bright).
Used by scripts/validate_quality.py to verify the training stack learns,
since only 3 real images ship with the reference.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cellseg_tpu.io import imwrite, imwrite_instance_tiff  # noqa: E402


def make_image(rng: np.random.Generator, size: int = 512,
               n_cells: int = 80, invert: bool = False):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    labels = np.zeros((size, size), np.int32)
    intensity = np.zeros((size, size), np.float64)
    lab = 0
    for _ in range(n_cells):
        cy, cx = rng.integers(15, size - 15, 2)
        a = rng.uniform(5, 16)
        b = rng.uniform(5, 16)
        theta = rng.uniform(0, np.pi)
        ct, st = np.cos(theta), np.sin(theta)
        dy, dx = yy - cy, xx - cx
        u = (ct * dy + st * dx) / a
        v = (-st * dy + ct * dx) / b
        inside = u * u + v * v <= 1.0
        fresh = inside & (labels == 0)
        if fresh.sum() < 30:
            continue
        lab += 1
        labels[fresh] = lab
        level = rng.uniform(0.5, 1.0)
        intensity[fresh] = level * (1.0 - 0.5 * (u * u + v * v)[fresh])
    img = intensity * 160 + 30 + rng.normal(0, 6, (size, size))
    if invert:
        img = 220 - img
    img = np.clip(img, 0, 255).astype(np.uint8)
    return np.stack([img] * 3, -1), labels


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--output", default="/tmp/cellseg_synth")
    p.add_argument("-n", "--num_images", type=int, default=40)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    for split, count in [("train", args.num_images),
                         ("test", max(args.num_images // 5, 4))]:
        img_dir = os.path.join(args.output, split, "images")
        lbl_dir = os.path.join(args.output, split, "labels")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lbl_dir, exist_ok=True)
        for i in range(count):
            img, lbl = make_image(rng, args.size, invert=(i % 3 == 2))
            stem = f"cell_{i:05d}"
            imwrite(os.path.join(img_dir, stem + ".png"), img)
            imwrite_instance_tiff(
                os.path.join(lbl_dir, stem + "_label.tiff"), lbl)
        print(f"{split}: {count} images in {args.output}/{split}")


if __name__ == "__main__":
    main()
