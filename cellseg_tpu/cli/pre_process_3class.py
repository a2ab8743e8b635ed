"""CLI: convert instance labels to 3-class maps + normalize images.

ABI parity with the reference `pre_process_3class -i -o`
(data/pre_process_3class.py:58-102): reads {input}/images + {input}/labels,
writes normalized PNG images and `{stem}_label.png` 3-class maps.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..io import imread, imwrite
from ..pipeline import create_interior_map, normalize_image

join = os.path.join


def main(argv=None):
    parser = argparse.ArgumentParser(
        "Preprocessing for microscopy image segmentation", add_help=False
    )
    parser.add_argument("-i", "--input_path", default="./data/Train_Labeled",
                        type=str,
                        help="training data path; subfolders: images, labels")
    parser.add_argument("-o", "--output_path", default="./data/Train_Pre_3class",
                        type=str, help="preprocessing data path")
    parser.add_argument("-h", "--help", action="help")
    args = parser.parse_args(argv)

    img_path = join(args.input_path, "images")
    gt_path = join(args.input_path, "labels")
    img_names = sorted(os.listdir(img_path))
    gt_names = [n.split(".")[0] + "_label.tiff" for n in img_names]

    pre_img_path = join(args.output_path, "images")
    pre_gt_path = join(args.output_path, "labels")
    os.makedirs(pre_img_path, exist_ok=True)
    os.makedirs(pre_gt_path, exist_ok=True)

    for img_name, gt_name in zip(img_names, gt_names):
        img_data = imread(join(img_path, img_name))
        gt_data = imread(join(gt_path, gt_name))

        pre_img_data = normalize_image(np.asarray(img_data))
        interior_map = create_interior_map(np.asarray(gt_data).astype(np.int16))

        stem = img_name.split(".")[0]
        imwrite(join(pre_img_path, stem + ".png"), pre_img_data)
        imwrite(join(pre_gt_path, gt_name.split(".")[0] + ".png"),
                interior_map.astype(np.uint8))
        print(f"processed {img_name}")


if __name__ == "__main__":
    main()
