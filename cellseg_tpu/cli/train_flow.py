"""CLI: flow-field (cellpose-style) training on NeurIPS-format data."""

from __future__ import annotations

import argparse

from ..train.flow_loop import FlowTrainConfig, train_flow


def main(argv=None):
    parser = argparse.ArgumentParser("Flow-field training")
    parser.add_argument("--data_path", default="./data/Train_Labeled",
                        type=str, help="images/ + labels/ (instance tiffs)")
    parser.add_argument("--work_dir", default="./work_dir", type=str)
    parser.add_argument("--input_size", default=224, type=int)
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--max_epochs", default=500, type=int)
    parser.add_argument("--learning_rate", default=2e-4, type=float)
    parser.add_argument("--seed", default=2022, type=int)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--n_devices", default=None, type=int,
                        help="data-parallel mesh size")
    parser.add_argument("--pretrained", "--retrain", dest="pretrained",
                        default=None, type=str,
                        help="warm-start from a pretrained flow checkpoint "
                             "(.ckpt file or model dir) — the cellpose2 "
                             "fine-tuning capability (reference README.md:34)")
    parser.add_argument("--omni", action="store_true",
                        help="train the omnipose-representation head: "
                             "distance-field-gradient flows + regressed "
                             "distance + boundary channel (the reference's "
                             "omnipose capability, "
                             "test_omnipose_cyto2_grey.py:23-28)")
    args = parser.parse_args(argv)

    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()

    cfg = FlowTrainConfig(
        data_path=args.data_path,
        work_dir=args.work_dir,
        input_size=args.input_size,
        batch_size=args.batch_size,
        max_epochs=args.max_epochs,
        learning_rate=args.learning_rate,
        seed=args.seed,
        dtype=args.dtype,
        n_devices=args.n_devices,
        pretrained=args.pretrained,
        omni=args.omni,
    )
    res = train_flow(cfg)
    print(f"flow training done: best val {res['best_val_loss']:.4f}")


if __name__ == "__main__":
    main()
