"""CLI: 3-class model training.

Flag parity with reference `model_training_3class`
(baseline/model_training_3class.py:52-81).
"""

from __future__ import annotations

import argparse

from ..train.loop import TrainConfig, train_3class


def main(argv=None):
    parser = argparse.ArgumentParser("TPU baseline for microscopy image segmentation")
    parser.add_argument("--data_path", default="./data/Train_Pre_3class/",
                        type=str,
                        help="training data path; subfolders: images, labels")
    parser.add_argument("--work_dir", default="./work_dir",
                        help="path where to save models and logs")
    parser.add_argument("--seed", default=2022, type=int)
    parser.add_argument("--resume", default=None, type=str,
                        help="checkpoint path to resume from")
    parser.add_argument("--num_workers", default=4, type=int,
                        help="(accepted for ABI compat; prefetch is threaded)")
    parser.add_argument("--model_name", default="unet",
                        help="select model: unet, unetr, swinunetr")
    parser.add_argument("--num_class", default=3, type=int,
                        help="segmentation classes")
    parser.add_argument("--input_size", default=256, type=int)
    parser.add_argument("--batch_size", default=8, type=int,
                        help="global batch size (sharded over the mesh)")
    parser.add_argument("--max_epochs", default=2000, type=int)
    parser.add_argument("--val_interval", default=2, type=int)
    parser.add_argument("--epoch_tolerance", default=100, type=int)
    parser.add_argument("--min_val_epoch", default=20, type=int,
                        help="first epoch eligible for validation "
                             "(reference validates after epoch 20)")
    parser.add_argument("--initial_lr", type=float, default=6e-4)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--no_augment", action="store_true")
    parser.add_argument("--n_devices", default=None, type=int,
                        help="data-parallel mesh size (default: largest "
                             "device count dividing the batch)")
    parser.add_argument("--ckpt_interval", default=1, type=int,
                        help="rolling resumable last_model.ckpt every N "
                             "epochs (0 disables)")
    parser.add_argument("--steps_per_dispatch", default=1, type=int,
                        help="fuse N train steps into one device dispatch "
                             "(lax.scan); numerically equivalent, amortizes "
                             "per-dispatch host round-trips on remote links")
    args = parser.parse_args(argv)

    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()

    cfg = TrainConfig(
        data_path=args.data_path,
        work_dir=args.work_dir,
        seed=args.seed,
        model_name=args.model_name,
        num_class=args.num_class,
        input_size=args.input_size,
        batch_size=args.batch_size,
        max_epochs=args.max_epochs,
        val_interval=args.val_interval,
        epoch_tolerance=args.epoch_tolerance,
        min_val_epoch=args.min_val_epoch,
        initial_lr=args.initial_lr,
        dtype=args.dtype,
        augment=not args.no_augment,
        n_devices=args.n_devices,
        resume=args.resume,
        ckpt_interval=args.ckpt_interval,
        steps_per_dispatch=args.steps_per_dispatch,
    )
    train_3class(cfg)


if __name__ == "__main__":
    main()
