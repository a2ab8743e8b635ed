"""CLI: flow-field (cellpose-style) inference.

Capability parity with the reference's cellpose eval wrappers
(cellpose-omnipose-KIT-GE/test_cellpose_cyto2_grey.py:16-34): grey-convert,
run the flow model, gradient-tracking decode, write `{stem}_label.tiff`.
`--diameter` mirrors cellpose's semantics (:33): omitted/auto = estimate
from a first pass and rescale to the model's nominal diameter; a number =
rescale directly. Images larger than --tile_threshold run through the
sliding-window engine instead of a whole-image jit. `--omni` selects the
omnipose-style suppressed-Euler decode (test_omnipose_cyto2_grey.py:23-28).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..io import imread, imwrite_instance_tiff, list_images
from ..train.checkpoint import load_model_for_inference

join = os.path.join


def main(argv=None):
    parser = argparse.ArgumentParser("Flow-field inference")
    parser.add_argument("-i", "--input_path", required=True, type=str)
    parser.add_argument("-o", "--output_path", required=True, type=str)
    default_model = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "assets", "pretrained_flow.ckpt")
    parser.add_argument("--model_path",
                        default=default_model if os.path.isfile(default_model)
                        else None, type=str,
                        help="model dir (config.json sidecar) or .ckpt file; "
                             "defaults to the bundled pretrained flow model "
                             "(zero-shot, the cellpose-cyto2 analog)")
    parser.add_argument("--checkpoint", default="best_model.ckpt")
    parser.add_argument("--prob_threshold", default=0.0, type=float)
    parser.add_argument("--n_iter", default=100, type=int)
    parser.add_argument("--diameter", default="auto",
                        help="'auto' (cellpose diameter=None semantics) or "
                             "a pixel diameter; 'off' disables rescaling")
    parser.add_argument("--tile_threshold", default=1024, type=int,
                        help="images larger than this on either axis use "
                             "tiled sliding-window inference")
    parser.add_argument("--roi", default=512, type=int,
                        help="tile size for the tiled path")
    parser.add_argument("--omni", action="store_true",
                        help="omnipose-style suppressed-Euler decode")
    parser.add_argument("--track_method", default=None,
                        choices=["propagate", "doubling", "euler", "omni"],
                        help="flow-tracking decode (default: the gather-free"
                             " bounded-window tracker; omni implies omni). "
                             "'propagate' assumes unit-normalized flows "
                             "(its window saturates at 2 px/hop) — for "
                             "external models with larger flow magnitudes "
                             "pass 'doubling'")
    parser.add_argument("--from_archive", default=None, type=str,
                        help="install real pretrained weights from a local "
                             "zip (.ckpt + JSON sidecar, arch-checked) and "
                             "predict with the first flow model in it — the "
                             "no-egress analog of the reference's model "
                             "downloader (KIT-GE download_models.py:24-45)")
    args = parser.parse_args(argv)
    if args.from_archive:
        import json as _json

        from .download_data import install_models_from_archive

        target = os.path.join(args.output_path, ".models")
        installed = install_models_from_archive(args.from_archive, target)
        flow_ckpts = []
        for ckpt in installed:
            sidecar_path = os.path.splitext(ckpt)[0] + ".json"
            if not os.path.exists(sidecar_path):
                sidecar_path = os.path.join(os.path.dirname(ckpt),
                                            "config.json")
            with open(sidecar_path) as f:
                if _json.load(f).get("model_name") == "flownet":
                    flow_ckpts.append(ckpt)
        if not flow_ckpts:
            parser.error(f"{args.from_archive}: no flownet checkpoint inside")
        args.model_path = flow_ckpts[0]
        print(f"using archive model {args.model_path}")
    if args.model_path is None:
        parser.error("--model_path is required (no bundled checkpoint found)")

    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from ..infer.flow_infer import NOMINAL_DIAMETER, FlowPredictor

    os.makedirs(args.output_path, exist_ok=True)
    model, params, sidecar = load_model_for_inference(args.model_path,
                                                      args.checkpoint)
    diam_mean = float((sidecar or {}).get("diam_mean", NOMINAL_DIAMETER))

    omni_head = bool((sidecar or {}).get("architecture", {}).get("omni",
                                                                 False))
    if omni_head:
        print("omnipose-representation model (dist>0 mask rule)")
    pred = FlowPredictor(
        lambda p, x: model.apply(p, x), params,
        prob_threshold=args.prob_threshold, n_iter=args.n_iter,
        diam_mean=diam_mean, tile_threshold=args.tile_threshold,
        roi=args.roi, omni=args.omni, method=args.track_method,
        omni_head=omni_head,
    )

    if args.diameter == "auto":
        diameter = None
        auto = True
    elif args.diameter in ("off", "none", ""):
        diameter = None
        auto = False
    else:
        diameter = float(args.diameter)
        auto = False

    for name in list_images(args.input_path):
        img = np.asarray(imread(join(args.input_path, name)))
        t0 = time.time()
        if auto:
            labels = pred.predict(img, diameter=None)
        elif diameter:
            labels = pred.predict(img, diameter=diameter)
        else:
            # rescaling disabled: single native-scale pass
            grey = img.mean(axis=-1) if img.ndim == 3 else img
            lo, hi = float(grey.min()), float(grey.max())
            labels = pred._forward_decode(
                (grey.astype(np.float32) - lo) / max(hi - lo, 1e-9))
        stem = name.split(".")[0]
        imwrite_instance_tiff(join(args.output_path, stem + "_label.tiff"),
                              labels.astype(np.int32))
        print(f"{name}: {labels.max()} cells, {time.time() - t0:.2f}s")

    from ..utils.hbm import maybe_record_hbm

    maybe_record_hbm()  # time_eval device-budget hook (no-op unless asked)


if __name__ == "__main__":
    main()
