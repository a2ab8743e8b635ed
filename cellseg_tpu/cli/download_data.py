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


def install_models_from_archive(archive: str, target: str) -> list[str]:
    """Unpack a user-provided zip of pretrained weights and arch-check
    every ``.ckpt`` + JSON-sidecar pair in it (the no-egress analog of the
    reference's model downloader, KIT-GE download_models.py:24-45).

    A checkpoint whose stored parameter tree does not match the
    architecture its sidecar declares fails the WHOLE install with one
    aggregated error — a silently wrong pretrained model is worse than no
    model. Returns the validated checkpoint paths."""
    from ..train.checkpoint import verify_checkpoint_arch

    os.makedirs(target, exist_ok=True)
    with zipfile.ZipFile(archive) as z:
        z.extractall(target)
    ckpts = sorted(
        os.path.join(root, f)
        for root, _, files in os.walk(target)
        for f in files if f.endswith(".ckpt"))
    if not ckpts:
        raise ValueError(f"{archive}: no .ckpt files found after unpack")
    errors, installed = [], []
    for ckpt in ckpts:
        try:
            cfg = verify_checkpoint_arch(ckpt)
            installed.append(ckpt)
            print(f"installed {os.path.relpath(ckpt, target)}: "
                  f"{cfg.get('model_name')} "
                  f"{cfg.get('architecture', {})} [arch-check ok]")
        except (ValueError, OSError, KeyError, TypeError) as e:
            # TypeError included: a malformed sidecar (unknown
            # 'architecture' key reaching build_model, or a non-dict JSON
            # body) must land in the aggregated report, not abort the
            # whole install (ADVICE r4)
            errors.append(str(e))
    if errors:
        raise ValueError("archive failed arch-check:\n  " +
                         "\n  ".join(errors))
    return installed


def main(argv=None):
    parser = argparse.ArgumentParser("Data/model preparation helper")
    parser.add_argument("--unpack", default=None, type=str,
                        help="local zip archive to unpack")
    parser.add_argument("--from_archive", default=None, type=str,
                        help="local zip of pretrained weights (.ckpt + "
                             "JSON sidecars) to install into --target "
                             "with a structural arch-check")
    parser.add_argument("--target", default="./data", type=str)
    args = parser.parse_args(argv)

    if args.from_archive:
        install_models_from_archive(args.from_archive, args.target)
    elif args.unpack:
        os.makedirs(args.target, exist_ok=True)
        with zipfile.ZipFile(args.unpack) as z:
            z.extractall(args.target)
        print(f"unpacked {args.unpack} -> {args.target}")
    else:
        print(EXPECTED_LAYOUT)


if __name__ == "__main__":
    main()
