"""CLI: distance-regression training (KIT-GE `train.py` capability).

Builds the distance training set from NeurIPS-format data if needed, then
trains the dual-decoder DUNet (flags mirror KIT-GE train.py:27-43).
"""

from __future__ import annotations

import argparse
import os

from ..train.distance_data import create_distance_training_set
from ..train.distance_loop import DistanceTrainConfig, train_distance


def main(argv=None):
    parser = argparse.ArgumentParser("Distance-regression training")
    parser.add_argument("--data_path", type=str, required=True,
                        help="raw data (images/ + labels/) OR a prepared "
                             "trainset dir (train/ + val/)")
    parser.add_argument("--work_dir", default="./work_dir", type=str)
    parser.add_argument("--trainset_dir", default=None, type=str,
                        help="where to build/cache the crop trainset")
    parser.add_argument("--crop_size", default=320, type=int)
    parser.add_argument("--mode", default=None, choices=["GT", "ST", "GT+ST"],
                        help="CTC annotation mode: treat --data_path as a "
                             "Cell Tracking Challenge cell-type dir "
                             "(reference train.py --mode)")
    parser.add_argument("--cell_type", default="", type=str,
                        help="CTC cell-type name (FOI margins, settings)")
    parser.add_argument("--split", default=None, type=str,
                        help="frozen-split JSON ({'train': [...], 'val': "
                             "[...]}) to reproduce an exact crop split "
                             "(kit-sch-ge split-file analog)")
    parser.add_argument("--st_limit", default=280, type=int,
                        help="max ST crops in GT+ST mode (reference quota)")
    parser.add_argument("--val_frac", default=0.2, type=float)
    parser.add_argument("--cell_radius", default=None, type=int,
                        help="override the stats-derived EDT window radius")
    parser.add_argument("--neighbor_radius", default=None, type=int,
                        help="override the stats-derived neighbor search "
                             "radius (reference: mean+std diameter)")
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--act_fun", default="relu",
                        choices=["relu", "leakyrelu", "elu", "gelu", "mish",
                                 "prelu"],
                        help="activation (reference train.py --act_fun)")
    parser.add_argument("--norm_method", default="gn",
                        choices=["gn", "in", "ln", "none", "bn"],
                        help="normalization (reference --norm_method); "
                             "'bn' maps to group norm — batch statistics "
                             "do not shard over a data-parallel TPU mesh, "
                             "and group norm is the standard equivalent")
    parser.add_argument("--pool_method", default="conv",
                        choices=["conv", "max"],
                        help="downsampling: strided convs ('conv', the "
                             "reference default) or max pooling + stride-1 "
                             "convs ('max')")
    parser.add_argument("--filters", nargs=2, type=int, default=[64, 1024],
                        metavar=("FIRST", "MAX"),
                        help="encoder filter ladder: FIRST doubling up to "
                             "MAX (reference --filters)")
    parser.add_argument("--loss", default="smooth_l1",
                        choices=["smooth_l1", "l1", "mse"])
    parser.add_argument("--optimizer", default="adam",
                        choices=["adam", "ranger"])
    parser.add_argument("--learning_rate", default=8e-4, type=float)
    parser.add_argument("--iterations", default=1, type=int,
                        help="independent training runs (KIT-GE --iterations)")
    parser.add_argument("--max_epochs", default=None, type=int)
    parser.add_argument("--pre_train", action="store_true",
                        help="autoencoder-pretrain the encoder first")
    parser.add_argument("--pretrain_data", default=None, type=str,
                        help="CTC-layout dir (<dir>/01, <dir>/02) to draw "
                             "the pretraining corpus from (frame "
                             "subsampling + random z-slices)")
    parser.add_argument("--n_devices", default=None, type=int,
                        help="data-parallel mesh size")
    parser.add_argument("--retrain", default=None, type=str,
                        help="warm-start from an old model dir "
                             "(arch-checked; reference train.py:114-122)")
    parser.add_argument("--seed", default=2022, type=int)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    args = parser.parse_args(argv)

    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()

    data = args.data_path
    if args.mode or os.path.isdir(os.path.join(data, "images")):
        trainset = args.trainset_dir or os.path.join(args.work_dir,
                                                     "distance_trainset")
        if not os.path.isdir(os.path.join(trainset, "train")):
            print(f"building distance trainset in {trainset}")
            info = create_distance_training_set(
                data, trainset, crop_size=args.crop_size, seed=args.seed,
                val_frac=args.val_frac,
                ctc_mode=args.mode, cell_type=args.cell_type,
                st_limit=args.st_limit, frozen_split=args.split,
                cell_radius=args.cell_radius,
                neighbor_radius=args.neighbor_radius)
            print("trainset:", info)
        data = trainset

    norm = {"gn": "group", "in": "instance", "ln": "layer",
            "none": "none", "bn": "group"}[args.norm_method]
    if args.norm_method == "bn":
        print("note: --norm_method bn maps to group norm on TPU "
              "(batch statistics do not shard over the mesh)")
    f0, fmax = args.filters
    channels = [f0]
    while channels[-1] < fmax:
        channels.append(channels[-1] * 2)
    channels[-1] = min(channels[-1], fmax)

    for it in range(args.iterations):
        cfg = DistanceTrainConfig(
            data_path=data,
            work_dir=args.work_dir if args.iterations == 1
            else os.path.join(args.work_dir, f"run{it}"),
            channels=tuple(channels),
            act=args.act_fun,
            norm=norm,
            pool=args.pool_method,
            loss=args.loss,
            optimizer=args.optimizer,
            batch_size=args.batch_size,
            learning_rate=args.learning_rate,
            max_epochs=args.max_epochs,
            seed=args.seed + it,
            dtype=args.dtype,
            pretrain=args.pre_train,
            pretrain_data=args.pretrain_data,
            retrain=args.retrain,
            n_devices=args.n_devices,
        )
        res = train_distance(cfg)
        print(f"run {it}: best val loss {res['best_val_loss']:.5f} "
              f"({res['epochs_run']} epochs, {res['wall_seconds']:.0f}s)")


if __name__ == "__main__":
    main()
