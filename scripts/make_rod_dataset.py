"""Synthetic rod-shaped (bacillus-like) cell dataset.

The omnipose representation exists for thin/elongated morphologies where
cellpose's center-seeking flows overshoot through the skeleton (the
omnipose paper's bacterial regime; reference capability
cellpose-omnipose-KIT-GE/test_omnipose_cyto2_grey.py). This generator
produces randomly oriented capsules (rods) with aspect ratios 3-6 so the
flow-vs-omni comparison exercises exactly that regime — the elliptical
generator (make_synthetic_dataset.py) produces compact cells where both
representations near-tie (BASELINE.md round 5).

Usage: python scripts/make_rod_dataset.py -o /tmp/cellseg_rods
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from cellseg_tpu.io import imwrite, imwrite_instance_tiff


def capsule_mask(h, w, cy, cx, length, radius, theta):
    """Pixels within `radius` of the center segment (a capsule/rod)."""
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    dy, dx = np.sin(theta), np.cos(theta)
    half = length / 2.0
    # project onto the segment axis, clamp to the segment
    t = np.clip((yy - cy) * dy + (xx - cx) * dx, -half, half)
    py, px = cy + t * dy, cx + t * dx
    return (yy - py) ** 2 + (xx - px) ** 2 <= radius**2


def make_image(rng, size):
    lbl = np.zeros((size, size), np.int32)
    n_try = int(size * size / 900)
    nxt = 1
    for _ in range(n_try):
        radius = rng.uniform(3.5, 6.0)
        length = radius * rng.uniform(6.0, 12.0)  # aspect ~3-6 incl. caps
        theta = rng.uniform(0, np.pi)
        cy = rng.uniform(length / 2, size - length / 2)
        cx = rng.uniform(length / 2, size - length / 2)
        m = capsule_mask(size, size, cy, cx, length, radius, theta)
        # allow touching but not overlap: drop candidates that collide
        if (lbl[m] > 0).mean() > 0.02:
            continue
        m &= lbl == 0
        if m.sum() < 40:
            continue
        lbl[m] = nxt
        nxt += 1
    # render: bright rods on dark noisy background + blur-ish halo
    img = rng.normal(55, 10, (size, size))
    img[lbl > 0] = rng.normal(170, 15, int((lbl > 0).sum()))
    from scipy import ndimage as ndi

    img = ndi.gaussian_filter(img, 1.0)
    img = np.clip(img, 0, 255).astype(np.uint8)
    return np.repeat(img[..., None], 3, axis=-1), lbl


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--output", default="/tmp/cellseg_rods")
    p.add_argument("-n", "--num_images", type=int, default=20)
    p.add_argument("--size", type=int, default=384)
    p.add_argument("--seed", type=int, default=11)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    for split, count in [("train", args.num_images),
                         ("test", max(args.num_images // 4, 4))]:
        img_dir = os.path.join(args.output, split, "images")
        lbl_dir = os.path.join(args.output, split, "labels")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lbl_dir, exist_ok=True)
        for i in range(count):
            img, lbl = make_image(rng, args.size)
            stem = f"rod_{i:05d}"
            imwrite(os.path.join(img_dir, stem + ".png"), img)
            imwrite_instance_tiff(
                os.path.join(lbl_dir, stem + "_label.tiff"), lbl)
        print(f"{split}: {count} images, "
              f"last has {lbl.max()} rods")


if __name__ == "__main__":
    main()
