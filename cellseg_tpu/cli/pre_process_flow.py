"""CLI: convert NeurIPS-format data to cellpose-style grey training pairs.

Parity with the reference's grey preprocessor
(cellpose-omnipose-KIT-GE/pre_img_for_cellpose_omnipose.py:27-64): RGB →
grey (scaled back to the original max), written as `{base}_img.tif` +
`{base}_masks.tif` pairs for training, and plain grey TIFFs for test dirs.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..io import imread, imwrite, list_images

join = os.path.join


def _to_grey(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 2:
        return img
    # rgb2gray * max (reference :38-41): luma weights, rescaled to the
    # original intensity ceiling
    grey = (0.2125 * img[..., 0] + 0.7154 * img[..., 1]
            + 0.0721 * img[..., 2])
    mx = float(img.max())
    if grey.max() > 0:
        grey = grey / grey.max() * mx
    return grey.astype(img.dtype)


def main(argv=None):
    parser = argparse.ArgumentParser(
        "Convert to cellpose-format grey training pairs")
    parser.add_argument("-i", "--input_path", required=True, type=str,
                        help="images/ (+ labels/ for training data)")
    parser.add_argument("-o", "--output_path", required=True, type=str)
    args = parser.parse_args(argv)

    os.makedirs(args.output_path, exist_ok=True)
    img_dir = join(args.input_path, "images")
    lbl_dir = join(args.input_path, "labels")
    has_labels = os.path.isdir(lbl_dir)
    src = img_dir if os.path.isdir(img_dir) else args.input_path

    for name in list_images(src):
        base = name.split(".")[0]
        grey = _to_grey(np.asarray(imread(join(src, name))))
        if has_labels:
            imwrite(join(args.output_path, base + "_img.tif"), grey)
            lbl = np.asarray(imread(join(lbl_dir, base + "_label.tiff")))
            imwrite(join(args.output_path, base + "_masks.tif"),
                    lbl.astype(np.uint16))
        else:
            imwrite(join(args.output_path, base + ".tif"), grey)
        print(f"converted {name}")


if __name__ == "__main__":
    main()
