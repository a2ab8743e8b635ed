"""CLI: native CTC SEG/DET measures over a sequence directory.

Drop-in workflow replacement for the precompiled SEGMeasure/DETMeasure
binaries the reference invokes (KIT-GE segmentation/utils/metrics.py:41-66):
`ctc_measure <data_root> <subset>` where <data_root>/<subset>_GT/SEG holds
man_seg*.tif and the results live in <data_root>/<subset>_RES/mask*.tif.
Prints 'SEG measure: x' / 'DET measure: x' lines like the binaries do.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser("Native CTC SEG/DET measures")
    parser.add_argument("data_root", help="dir with <subset>_GT and "
                                          "<subset>_RES")
    parser.add_argument("subset", nargs="?", default="01")
    parser.add_argument("--mode", default="GT", choices=["GT", "ST"])
    parser.add_argument("--res_dir", default=None,
                        help="override results dir (default "
                             "<data_root>/<subset>_RES)")
    parser.add_argument("--json", action="store_true",
                        help="emit the full JSON result")
    args = parser.parse_args(argv)

    from ..metrics.ctc import ctc_metrics_sequence

    res_dir = args.res_dir or os.path.join(args.data_root,
                                           f"{args.subset}_RES")
    out = ctc_metrics_sequence(args.data_root, res_dir,
                               subset=args.subset, mode=args.mode)
    print(f"SEG measure: {out['SEG']:.6f}")
    if out["DET"] == out["DET"]:  # not NaN
        print(f"DET measure: {out['DET']:.6f}")
    if args.json:
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    main()
