"""Real-microscopy quality anchor on the 3 bundled labeled images.

The only real labeled data available offline is the reference's 3 bundled
(image, instance-label) pairs (/root/reference/data/Train_Labeled —
cell_00225 1024² RGB brightfield (6 cells), cell_00528 200² uint16
fluorescence (44 cells), cell_00849 512² RGB dense culture (187 cells);
three DIFFERENT modalities).

Two modes:

- ``patch`` (default): quadrant holdout. Each image is split into 4
  quadrants; ONE quadrant per image is held out (chosen per image so the
  test patch actually contains interior instances — cell_00225's BR
  quadrant is empty, e.g.), the other 3 are training data. ONE model per
  pipeline is trained on the 9 training patches (mixed-modality, exactly
  the challenge setting) and scored on the 3 held-out patches through
  the REAL CLIs. This is the meaningful real-morphology anchor
  (VERDICT r2 item 6).

- ``loo``: leave-one-IMAGE-out (train on 2 images, score the 3rd, all 3
  rotations). Because each image is a different modality, this measures
  cross-modality generalization from a 2-image corpus and is degenerate
  by construction (F1 ≈ 0.01 measured) — kept for the record.

Both modes also measure the device-vs-host watershed decode agreement on
the trained distance predictions (VERDICT r2 item 2's trained-checkpoint
audit).

Usage: python scripts/real_data_anchor.py --out /tmp/anchor
Writes <out>/anchor.json; numbers are recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)
DATA = "/root/reference/data/Train_Labeled"
NAMES = ["cell_00225.png", "cell_00528.tif", "cell_00849.png"]
# per-image held-out quadrant: the one with the most interior (non-edge)
# GT instances so the test patch is non-degenerate (cell_00225 has only
# 6 sparse cells — its BR quadrant is EMPTY)
HOLDOUT_QUAD = {"cell_00225": "bl", "cell_00528": "bl",
                "cell_00849": "tr"}


def run(cmd: list[str]) -> None:
    print("+", " ".join(cmd), flush=True)
    # unbuffered children: epoch/sweep progress reaches a redirected log
    # live instead of flushing only at process exit (multi-hour runs are
    # unobservable otherwise)
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    subprocess.run(cmd, check=True, cwd=REPO, env=env)


def best_ckpt(model_dir: str) -> str:
    for name in ("best_model.ckpt", "final_model.ckpt"):
        if os.path.exists(os.path.join(model_dir, name)):
            return name
    raise FileNotFoundError(f"no checkpoint in {model_dir}")


def f1_per_case(gt_dir: str, seg_dir: str, out_dir: str) -> dict:
    run([sys.executable, "-m", "cellseg_tpu.cli.compute_metric",
         "-g", gt_dir, "-s", seg_dir,
         "--gt_suffix", "_label.tiff", "--seg_suffix", "_label.tiff",
         "-o", out_dir, "-n", "val"])
    import pandas as pd

    df = pd.read_csv(os.path.join(out_dir, "val-0.5.csv"))
    per = {str(r["names"]): float(r["F1"]) for _, r in df.iterrows()}
    per["mean"] = float(df["F1"].mean())
    return per


def stage_patch_holdout(out: str) -> tuple[str, str]:
    """Quadrant split: HOLDOUT_QUAD of each image → test/, rest → train/."""
    import numpy as np

    from cellseg_tpu.io.images import imread, imwrite, imwrite_instance_tiff

    root = os.path.join(out, "patch_holdout")
    for sub in ("train/images", "train/labels", "test/images",
                "test/labels"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for n in NAMES:
        stem, ext = n.rsplit(".", 1)
        img = np.asarray(imread(os.path.join(DATA, "images", n)))
        lbl = np.asarray(imread(
            os.path.join(DATA, "labels", f"{stem}_label.tiff")))
        h, w = lbl.shape
        hh, ww = h // 2, w // 2
        quads = {"tl": (0, 0), "tr": (0, ww), "bl": (hh, 0),
                 "br": (hh, ww)}
        for q, (y, x) in quads.items():
            sl = (slice(y, y + hh), slice(x, x + ww))
            sub_lbl = lbl[sl]
            # compact instance ids after the cut; anchor 0 so a quadrant
            # with no background pixels can't remap a real instance to 0
            uniq = np.unique(np.concatenate(([0], sub_lbl.ravel())))
            sub_lbl = np.searchsorted(uniq, sub_lbl).astype(np.int32)
            dst = "test" if q == HOLDOUT_QUAD[stem] else "train"
            imwrite(os.path.join(root, dst, "images",
                                 f"{stem}_{q}.{ext}"), img[sl])
            imwrite_instance_tiff(
                os.path.join(root, dst, "labels",
                             f"{stem}_{q}_label.tiff"), sub_lbl)
    return os.path.join(root, "train"), os.path.join(root, "test")


def stage_rotation(out: str, holdout: str) -> tuple[str, str]:
    """LOO: train/ holds the other two pairs; test/ holds the holdout."""
    rot = os.path.join(out, f"rot_{holdout.split('.')[0]}")
    for sub in ("train/images", "train/labels", "test/images",
                "test/labels"):
        os.makedirs(os.path.join(rot, sub), exist_ok=True)
    for n in NAMES:
        stem = n.split(".")[0]
        dst = "test" if n == holdout else "train"
        shutil.copy(os.path.join(DATA, "images", n),
                    os.path.join(rot, dst, "images", n))
        shutil.copy(os.path.join(DATA, "labels", f"{stem}_label.tiff"),
                    os.path.join(rot, dst, "labels", f"{stem}_label.tiff"))
    return os.path.join(rot, "train"), os.path.join(rot, "test")


def decode_delta_f1(model_dir: str, test_images: str) -> dict:
    """Device vs host watershed decode on the SAME trained distance
    predictions: pixel agreement and instance-F1 between the two decodes
    (the tie-behavior audit on real trained outputs)."""
    import numpy as np

    from cellseg_tpu.decode.distance import _seeds_and_mask
    from cellseg_tpu.infer.distance_infer import DistancePredictor
    from cellseg_tpu.metrics.f1 import eval_tp_fp_fn
    from cellseg_tpu.ops.watershed import watershed_host, watershed_jax
    from cellseg_tpu.train.checkpoint import load_model_for_inference

    import jax
    import jax.numpy as jnp

    model, params, _ = load_model_for_inference(model_dir,
                                                best_ckpt(model_dir))
    pred = DistancePredictor(
        lambda p, x: model.apply(p, x), params)
    out = {}
    from cellseg_tpu.io import imread, list_images

    for name in list_images(test_images):
        img = np.asarray(imread(os.path.join(test_images, name)))
        border, cell = pred.predict_raw(img)
        # per-modality raw-prediction diagnosis (VERDICT r5 item 6): what
        # did the net actually emit on this held-out case? A cell head
        # whose p99 sits below th_cell explains an F1 of 0 structurally
        # (no mask), as opposed to a thresholding/sweep artifact.
        raw_stats = {
            "cell_max": round(float(np.max(cell)), 4),
            "cell_p99": round(float(np.percentile(cell, 99)), 4),
            "border_max": round(float(np.max(border)), 4),
            "border_p99": round(float(np.percentile(border, 99)), 4),
            "mask_frac_at_0.07": round(float((cell > 0.07).mean()), 4),
        }
        # same seed-decay rescue as decode_distance (weak models need
        # lower th_seed before any marker appears; a single fixed-th pass
        # yields zero seeds -> a vacuous 0/0 comparison)
        th = 0.45
        cell_s, mask, seeds = _seeds_and_mask(
            jnp.asarray(cell), jnp.asarray(border),
            jnp.float32(0.07), jnp.float32(th))
        while int(jax.device_get(jnp.max(seeds))) == 0 and th > 0.05:
            th -= 0.1
            cell_s, mask, seeds = _seeds_and_mask(
                jnp.asarray(cell), jnp.asarray(border),
                jnp.float32(0.07), jnp.float32(th), rescue=True)
        dev = np.asarray(jax.device_get(
            watershed_jax(-cell_s, seeds, mask)))
        host = watershed_host(np.asarray(jax.device_get(-cell_s)),
                              np.asarray(jax.device_get(seeds)),
                              np.asarray(jax.device_get(mask)))
        m = np.asarray(jax.device_get(mask))
        agree = float((dev[m] == host[m]).mean()) if m.any() else 1.0
        n_inst = int(np.asarray(jax.device_get(jnp.max(seeds))))
        tp, fp, fn = eval_tp_fp_fn(host, dev, threshold=0.5)
        f1 = 2 * tp / max(2 * tp + fp + fn, 1) if n_inst else 1.0
        out[name] = {"pixel_agreement_in_mask": agree,
                     "instance_f1_dev_vs_host": f1,
                     "n_instances": n_inst,
                     "raw": raw_stats}
    return out


def eval_pipelines(rot: str, train: str, test: str, args,
                   results: dict, key: str) -> None:
    if "3class" in args.pipelines:
        pre = os.path.join(rot, "train_pre")
        if not os.path.isdir(pre):
            run([sys.executable, "-m",
                 "cellseg_tpu.cli.pre_process_3class",
                 "-i", train, "-o", pre])
        wd = os.path.join(rot, "wd3c")
        model_dir = os.path.join(wd, "unet_3class")
        if not os.path.exists(os.path.join(model_dir, "final_model.ckpt")):
            run([sys.executable, "-m", "cellseg_tpu.cli.train",
                 "--data_path", pre, "--work_dir", wd,
                 "--max_epochs", str(args.epochs3c),
                 "--min_val_epoch", "4", "--epoch_tolerance", "60",
                 "--batch_size", "4"])
        for decode, extra, rkey in (
                ("cc", [], "3class"),
                ("boundary_watershed", [], "3class_watershed"),
                ("boundary_watershed", ["--tta"], "3class_watershed_tta")):
            tag = decode + ("_tta" if extra else "")
            seg = os.path.join(rot, f"seg3c_{tag}")
            run([sys.executable, "-m", "cellseg_tpu.cli.predict",
                 "-i", os.path.join(test, "images"), "-o", seg,
                 "--model_path", model_dir,
                 "--checkpoint", best_ckpt(model_dir),
                 "--decode", decode] + extra)
            results[rkey][key] = f1_per_case(
                os.path.join(test, "labels"), seg,
                os.path.join(rot, f"m3c_{tag}"))

    if "distance_permod" in args.pipelines:
        # KIT-GE trains one model PER CELL TYPE (per modality): the
        # reference's training sets, downloaders, and eval are all keyed by
        # CTC cell-type directory (KIT-GE/download_models.py:24-45,
        # segmentation/training — never one mixed model). The mixed-corpus
        # distance leg collapses to predicting the corpus-mean distance
        # value (diagnosed round 5: sweep threshold-invariant, mask
        # fraction 0% at th_cell 0.25 vs 96% at 0.07 — the cell head's
        # output histogram squeezed at ~0.1-0.2). Per-modality training is
        # the reference-faithful setting for this leg.
        import pandas as pd

        per = {}
        merged_seg = os.path.join(rot, "segd_permod")
        shutil.rmtree(merged_seg, ignore_errors=True)
        os.makedirs(merged_seg, exist_ok=True)
        clahe = ["--apply_clahe"] if args.apply_clahe else []
        stems = sorted({n.rsplit(".", 1)[0] for n in NAMES})
        from cellseg_tpu.io import list_images

        for stem in stems:
            sub = os.path.join(rot, f"mod_{stem}")
            strain = os.path.join(sub, "train")
            for d in ("images", "labels"):
                os.makedirs(os.path.join(strain, d), exist_ok=True)
                src = os.path.join(train, d)
                for f in os.listdir(src):
                    if f.startswith(stem):
                        dst = os.path.join(strain, d, f)
                        if not os.path.exists(dst):
                            shutil.copy(os.path.join(src, f), dst)
            wd = os.path.join(sub, "wdd")
            model_dir = os.path.join(wd, "dunet_distance")
            if not os.path.exists(os.path.join(model_dir,
                                               "best_model.ckpt")):
                run([sys.executable, "-m",
                     "cellseg_tpu.cli.train_distance",
                     "--data_path", strain, "--work_dir", wd,
                     "--crop_size", str(args.crop_dist),
                     "--max_epochs", str(args.epochs_dist)])
            sweep_dir = os.path.join(sub, "sweep")
            run([sys.executable, "-m", "cellseg_tpu.cli.eval_distance",
                 "--data_path", strain, "--model_path", model_dir,
                 "--th_seed", "0.35", "0.45", "0.55", "0.65",
                 "--th_cell", "0.07", "0.25", "0.5",
                 "-o", sweep_dir] + clahe)
            df = pd.read_csv(os.path.join(sweep_dir, "metrics.csv"))
            best = df.loc[df["OP_CSB"].idxmax()]
            th_seed, th_cell = float(best["th_seed"]), float(best["th_cell"])
            stest = os.path.join(sub, "test_images")
            os.makedirs(stest, exist_ok=True)
            for f in list_images(os.path.join(test, "images")):
                if f.startswith(stem):
                    dst = os.path.join(stest, f)
                    if not os.path.exists(dst):
                        shutil.copy(os.path.join(test, "images", f), dst)
            seg = os.path.join(sub, "segd")
            shutil.rmtree(seg, ignore_errors=True)
            run([sys.executable, "-m", "cellseg_tpu.cli.infer_distance",
                 "-i", stest, "-o", seg, "--model_path", model_dir,
                 "--th_seed", str(th_seed), "--th_cell", str(th_cell)]
                + clahe)
            for f in os.listdir(seg):
                shutil.copy(os.path.join(seg, f), merged_seg)
            per[stem] = {"th_seed": th_seed, "th_cell": th_cell,
                         "train_OP_CSB": float(best["OP_CSB"])}
        scores = f1_per_case(os.path.join(test, "labels"), merged_seg,
                             os.path.join(rot, "md_permod"))
        scores["per_modality"] = per
        results.setdefault("distance_permod", {})[key] = scores

    if "distance" in args.pipelines:
        wd = os.path.join(rot, "wdd")
        model_dir = os.path.join(wd, "dunet_distance")
        if not os.path.exists(os.path.join(model_dir, "best_model.ckpt")):
            run([sys.executable, "-m", "cellseg_tpu.cli.train_distance",
                 "--data_path", train, "--work_dir", wd,
                 "--crop_size", str(args.crop_dist),
                 "--max_epochs", str(args.epochs_dist)])
        # KIT-GE workflow parity: the reference never ships raw defaults —
        # eval.py grid-sweeps th_seed x th_cell on labeled data and submits
        # the winner (eval.py:140-243, utils.get_best_model). Sweep on the
        # TRAIN patches (the held-out quadrants stay unseen) and infer the
        # test patches with the winning setting.
        clahe = ["--apply_clahe"] if args.apply_clahe else []
        sweep_dir = os.path.join(rot, "sweep")
        run([sys.executable, "-m", "cellseg_tpu.cli.eval_distance",
             "--data_path", train, "--model_path", model_dir,
             "--th_seed", "0.35", "0.45", "0.55", "0.65",
             "--th_cell", "0.07", "0.25", "0.5",
             "-o", sweep_dir] + clahe)
        import pandas as pd

        df = pd.read_csv(os.path.join(sweep_dir, "metrics.csv"))
        best = df.loc[df["OP_CSB"].idxmax()]
        th_seed, th_cell = float(best["th_seed"]), float(best["th_cell"])
        seg = os.path.join(rot, "segd")
        shutil.rmtree(seg, ignore_errors=True)
        run([sys.executable, "-m", "cellseg_tpu.cli.infer_distance",
             "-i", os.path.join(test, "images"), "-o", seg,
             "--model_path", model_dir,
             "--th_seed", str(th_seed), "--th_cell", str(th_cell)] + clahe)
        results["distance"][key] = f1_per_case(
            os.path.join(test, "labels"), seg, os.path.join(rot, "md"))
        results["distance"][key]["th_seed"] = th_seed
        results["distance"][key]["th_cell"] = th_cell
        results["distance"][key]["train_OP_CSB"] = float(best["OP_CSB"])
        results["decode_delta"][key] = decode_delta_f1(
            model_dir, os.path.join(test, "images"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/cellseg_real_anchor")
    p.add_argument("--mode", choices=["patch", "loo"], default="patch")
    p.add_argument("--epochs3c", type=int, default=300)
    p.add_argument("--epochs_dist", type=int, default=320)
    p.add_argument("--crop_dist", type=int, default=256,
                   help="distance trainset crop size; 128 yields ~4x more "
                        "crops from the tiny 9-patch anchor corpus")
    p.add_argument("--pipelines", nargs="+", default=["3class", "distance"])
    p.add_argument("--apply_clahe", action="store_true",
                   help="KIT-GE inference CLAHE knob through sweep + infer "
                        "(the anchor-diagnosis lever, VERDICT r5 item 6)")
    p.add_argument("--rotations", nargs="+", default=NAMES)
    args = p.parse_args()

    results = {"3class": {}, "3class_watershed": {},
               "3class_watershed_tta": {}, "distance": {},
               "decode_delta": {}}
    # partial reruns (e.g. --pipelines distance after a 3class run) merge
    # into the existing record instead of erasing the other pipelines
    prev = os.path.join(args.out, "anchor.json")
    if os.path.exists(prev):
        with open(prev) as f:
            for k, v in json.load(f).items():
                if isinstance(v, dict):
                    results.setdefault(k, {}).update(v)
    if args.mode == "patch":
        train, test = stage_patch_holdout(args.out)
        rot = os.path.dirname(train)
        eval_pipelines(rot, train, test, args, results, "patch_holdout")
        with open(os.path.join(args.out, "anchor.json"), "w") as f:
            json.dump(results, f, indent=2)
    else:
        for holdout in args.rotations:
            key = holdout.split(".")[0]
            train, test = stage_rotation(args.out, holdout)
            eval_pipelines(os.path.dirname(train), train, test, args,
                           results, key)
            with open(os.path.join(args.out, "anchor.json"), "w") as f:
                json.dump(results, f, indent=2)
            print(json.dumps({key: {k: results[k].get(key)
                                    for k in results}}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
