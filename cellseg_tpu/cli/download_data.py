"""CLI: dataset/model download helper (KIT-GE download_data/download_models
capability).

The reference downloads Cell Tracking Challenge zips and pretrained model
archives over HTTP (KIT-GE download_data.py:30-76, download_models.py:24-45).
This environment has no network egress, so this command documents the
expected layout and verifies/unpacks local archives instead.
"""

from __future__ import annotations

import argparse
import os
import zipfile

EXPECTED_LAYOUT = """\
Expected data layout (NeurIPS CellSeg format):
  <root>/images/*.png|tif        raw images
  <root>/labels/*_label.tiff     instance label maps

Expected CTC layout (KIT-GE format):
  <root>/<CELL_TYPE>/01, 01_GT/SEG, 01_ST/SEG, 02, ...

Sources (download manually; no egress from this environment):
  - NeurIPS 2022 CellSeg challenge: https://neurips22-cellseg.grand-challenge.org/
  - Cell Tracking Challenge:        http://data.celltrackingchallenge.net/
"""


def main(argv=None):
    parser = argparse.ArgumentParser("Data/model preparation helper")
    parser.add_argument("--unpack", default=None, type=str,
                        help="local zip archive to unpack")
    parser.add_argument("--target", default="./data", type=str)
    args = parser.parse_args(argv)

    if args.unpack:
        os.makedirs(args.target, exist_ok=True)
        with zipfile.ZipFile(args.unpack) as z:
            z.extractall(args.target)
        print(f"unpacked {args.unpack} -> {args.target}")
    else:
        print(EXPECTED_LAYOUT)


if __name__ == "__main__":
    main()
