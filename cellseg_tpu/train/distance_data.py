"""Distance-pipeline training sets (KIT-GE capability).

Capability-equivalent of the reference's training-set builder
(KIT-GE segmentation/training/create_training_sets.py:617-975) for
NeurIPS-format data (images/ + instance labels/): min-max normalization,
cell/neighbor distance target generation (pipeline/distance_labels.py),
crop-grid extraction with an annotation-quality gate, and a seeded
train/val split. Crops are written as float32 .npz shards (one per image)
— a simpler container than the reference's per-crop TIFF triples with the
same information content.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..io import imread
from ..pipeline.distance_labels import distance_label_2d
from ..utils.regions import region_props

join = os.path.join


def _radii_from_stats(label: np.ndarray) -> tuple[int, int]:
    """Cell/neighbor EDT radii from cell-size statistics (the reference
    derives these from per-cell-type diameter stats, get_td_settings,
    create_training_sets.py:458-513)."""
    props = region_props(label)
    if not props:
        return 32, 32
    diam = np.array([p.equivalent_diameter for p in props])
    r = int(np.ceil(0.5 * diam.max())) + 2
    return int(np.clip(r, 16, 128)), int(np.clip(2 * r, 32, 256))


def _minmax_uint16(img: np.ndarray) -> np.ndarray:
    img = img.astype(np.float64)
    lo, hi = img.min(), img.max()
    if hi - lo < 1e-9:
        return np.zeros(img.shape, np.uint16)
    return (65535 * (img - lo) / (hi - lo)).astype(np.uint16)


def collect_ctc_pairs(root: str, mode: str = "GT") -> list[tuple[str, str]]:
    """Collect (image, label) pairs from a Cell Tracking Challenge tree.

    CTC layout (reference create_training_sets.py:617-735):
      <root>/01/t000.tif        frames
      <root>/01_GT/SEG/man_seg000.tif   gold annotations
      <root>/01_ST/SEG/man_seg000.tif   silver annotations
    mode: GT | ST | GT+ST.
    """
    pairs = []
    modes = ["GT", "ST"] if mode == "GT+ST" else [mode]
    for seq in sorted(os.listdir(root)):
        seq_dir = join(root, seq)
        if not (os.path.isdir(seq_dir) and seq.isdigit()):
            continue
        for m in modes:
            seg_dir = join(root, f"{seq}_{m}", "SEG")
            if not os.path.isdir(seg_dir):
                continue
            for seg_name in sorted(os.listdir(seg_dir)):
                if not seg_name.startswith("man_seg"):
                    continue
                frame = seg_name.replace("man_seg", "").split(".")[0]
                for ext in (".tif", ".tiff"):
                    img_path = join(seq_dir, f"t{frame}{ext}")
                    if os.path.exists(img_path):
                        pairs.append((img_path, join(seg_dir, seg_name)))
                        break
    return pairs


def create_distance_training_set(input_path: str, output_path: str,
                                 crop_size: int = 320,
                                 val_frac: float = 0.2,
                                 min_cell_area: int = 1,
                                 seed: int = 2022,
                                 ctc_mode: str | None = None) -> dict:
    """Build a distance-regression training set.

    input_path: either NeurIPS format (images/ + labels/ with
    {stem}_label.tiff) or, with ctc_mode set (GT/ST/GT+ST), a Cell
    Tracking Challenge cell-type directory.
    """
    if ctc_mode:
        pairs = collect_ctc_pairs(input_path, ctc_mode)
    else:
        img_dir = join(input_path, "images")
        lbl_dir = join(input_path, "labels")
        pairs = [
            (join(img_dir, name),
             join(lbl_dir, name.split(".")[0] + "_label.tiff"))
            for name in sorted(os.listdir(img_dir))
        ]
    return _create_from_pairs(pairs, output_path, crop_size, val_frac,
                              min_cell_area, seed)


def _create_from_pairs(pairs: list[tuple[str, str]], output_path: str,
                       crop_size: int, val_frac: float, min_cell_area: int,
                       seed: int) -> dict:
    os.makedirs(join(output_path, "train"), exist_ok=True)
    os.makedirs(join(output_path, "val"), exist_ok=True)

    rng = np.random.RandomState(seed)
    order = rng.permutation(len(pairs))
    n_val = max(1, int(len(pairs) * val_frac)) if len(pairs) > 1 else 0
    val_set = set(order[:n_val].tolist())

    counts = {"train": 0, "val": 0}
    for i, (img_file, lbl_file) in enumerate(pairs):
        img = np.asarray(imread(img_file))
        stem = f"{i:04d}_" + os.path.basename(img_file).split(".")[0]
        lbl = np.asarray(imread(lbl_file))
        if img.ndim == 3:
            img = img.mean(axis=-1)  # distance nets are single-channel
        img = _minmax_uint16(img)

        cell_r, neigh_r = _radii_from_stats(lbl)
        cell_d, neigh_d = distance_label_2d(lbl.astype(np.int32),
                                            cell_r, neigh_r)

        split = "val" if i in val_set else "train"
        h, w = img.shape
        crops = []
        for y in range(0, max(h - crop_size, 0) + 1, crop_size):
            for x in range(0, max(w - crop_size, 0) + 1, crop_size):
                sl = (slice(y, y + crop_size), slice(x, x + crop_size))
                lbl_c = lbl[sl]
                if lbl_c.shape != (crop_size, crop_size):
                    continue
                # quality gate: crop must contain at least one cell
                if (lbl_c > 0).sum() < min_cell_area:
                    continue
                crops.append((img[sl], cell_d[sl], neigh_d[sl], lbl_c > 0))
        if not crops and h >= 1 and w >= 1:
            # small image: pad up to one full crop
            pad_h, pad_w = max(crop_size - h, 0), max(crop_size - w, 0)
            pad = lambda a: np.pad(a, ((0, pad_h), (0, pad_w)))
            crops.append((pad(img)[:crop_size, :crop_size],
                          pad(cell_d)[:crop_size, :crop_size],
                          pad(neigh_d)[:crop_size, :crop_size],
                          pad((lbl > 0).astype(np.uint8))[:crop_size,
                                                          :crop_size] > 0))
        for k, (ic, cc, nc, mc) in enumerate(crops):
            np.savez_compressed(
                join(output_path, split, f"{stem}_{k:03d}.npz"),
                img=ic.astype(np.uint16),
                dist_cell=cc.astype(np.float32),
                dist_neighbor=nc.astype(np.float32),
                mask=mc,
            )
            counts[split] += 1

    info = {"crop_size": crop_size, "counts": counts, "seed": seed}
    with open(join(output_path, "info.json"), "w") as f:
        json.dump(info, f, indent=2)
    return info


class DistanceCropDataset:
    """In-memory .npz crop dataset for the dual-head trainer."""

    def __init__(self, root: str, split: str = "train", seed: int = 2022):
        self.files = sorted(
            join(root, split, f) for f in os.listdir(join(root, split))
            if f.endswith(".npz")
        )
        self.items = []
        for f in self.files:
            z = np.load(f)
            self.items.append((z["img"], z["dist_cell"], z["dist_neighbor"]))
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.items)

    def batches(self, batch_size: int, shuffle: bool = True):
        order = (self.rng.permutation(len(self.items)) if shuffle
                 else np.arange(len(self.items)))
        for s in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[s:s + batch_size]
            imgs = np.stack([self.items[i][0] for i in idx])[..., None]
            cell = np.stack([self.items[i][1] for i in idx])[..., None]
            neigh = np.stack([self.items[i][2] for i in idx])[..., None]
            # min-max → [-1, 1] (KIT-GE ToTensor, mytransforms.py:456-500)
            imgs = imgs.astype(np.float32) / 65535.0 * 2.0 - 1.0
            yield imgs, neigh, cell
        if len(order) and len(order) < batch_size:
            idx = np.resize(order, batch_size)
            imgs = np.stack([self.items[i][0] for i in idx])[..., None]
            cell = np.stack([self.items[i][1] for i in idx])[..., None]
            neigh = np.stack([self.items[i][2] for i in idx])[..., None]
            imgs = imgs.astype(np.float32) / 65535.0 * 2.0 - 1.0
            yield imgs, neigh, cell


def get_max_epochs(n_samples: int) -> int:
    """Dataset-size-scaled epoch budget (reference training.py:15-36)."""
    if n_samples >= 1000:
        return 200
    if n_samples >= 500:
        return 240
    if n_samples >= 200:
        return 320
    if n_samples >= 100:
        return 400
    if n_samples >= 50:
        return 480
    return 560
