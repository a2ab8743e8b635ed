"""Distance-pipeline training sets (KIT-GE capability).

Capability-equivalent of the reference's training-set builder
(KIT-GE segmentation/training/create_training_sets.py:617-975) for
NeurIPS-format data (images/ + instance labels/) and CTC trees:

  - dataset-wide settings from cell-size statistics — search radius,
    min area, max major-axis length, adaptive downscale
    (get_td_settings, create_training_sets.py:458-513)
  - FOI training crop per cell type (foi_correction_train, :152-194)
  - crop grid with the reference's per-crop gates and A/B annotation-
    quality classification (generate_data, :197-302)
  - crop-level train/val split with B-quality crops train-only
    (get_train_val_split, :516-539; B only used when few A crops, :861)
  - GT+ST mixing with per-split ST quotas (:684-733)
  - frozen-split reproduction via a JSON id file (analog of the
    kit-sch-ge split JSONs loaded at :679)

Crops are written as float32 .npz shards — a simpler container than the
reference's per-crop TIFF quadruples with the same information content.

Note: the reference's get_train_val_split trains on ALL A-quality crops and
draws validation from an overlapping 20% tail (the non-overlap line is
commented out at :531). Here the split is non-overlapping.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..io import imread
from ..utils.regions import region_props

join = os.path.join


def _minmax_uint16(img: np.ndarray) -> np.ndarray:
    img = img.astype(np.float64)
    lo, hi = img.min(), img.max()
    if hi - lo < 1e-9:
        return np.zeros(img.shape, np.uint16)
    return (65535 * (img - lo) / (hi - lo)).astype(np.uint16)


def compute_td_settings(masks, crop_size: int = 320) -> dict:
    """Training-data settings from cell-size statistics over ALL masks
    (reference get_td_settings, create_training_sets.py:458-513):
    search radius = mean+std diameter, min area = 0.95·min area,
    max_mal = max major axis, plus adaptive downscale for large cells.
    """
    diameters, major_axes, areas = [], [], []
    for mask in masks:
        for cell in region_props(np.asarray(mask)):
            major_axes.append(cell.major_axis_length)
            diameters.append(cell.equivalent_diameter)
            areas.append(cell.area)
    if not diameters:
        return {"search_radius": 64, "min_area": 1, "max_mal": 64,
                "scale": 1.0, "crop_size": crop_size}

    max_diameter = int(np.ceil(np.max(diameters)))
    min_diameter = int(np.ceil(np.min(diameters)))
    mean_diameter = int(np.ceil(np.mean(diameters)))
    std_diameter = int(np.std(diameters))
    max_mal = int(np.ceil(np.max(major_axes)))
    min_area = int(0.95 * np.floor(np.min(areas)))
    search_radius = mean_diameter + std_diameter

    # large-cell downscale heuristics (reference :492-505)
    if max_diameter > 200 and min_diameter > 35:
        if max_mal > 2 * max_diameter:  # very longish cells
            scale = 0.5
            search_radius = min_diameter + 0.5 * std_diameter
        elif max_diameter > 300 and min_diameter > 60:
            scale = 0.5
        elif max_diameter > 250 and min_diameter > 50:
            scale = 0.6
        else:
            scale = 0.7
        min_area = (scale ** 2) * min_area
        max_mal = int(np.ceil(scale * max_mal))
        search_radius = int(np.ceil(scale * search_radius))
    else:
        scale = 1.0

    return {"search_radius": int(search_radius), "min_area": float(min_area),
            "max_mal": max_mal, "scale": float(scale),
            "crop_size": crop_size}


def foi_crop_train(cell_type: str, mode: str, *arrays):
    """Field-of-interest training crop (reference foi_correction_train,
    create_training_sets.py:152-194): trims per-cell-type margins so crops
    come from the annotated field of interest."""
    if mode == "GT":
        if cell_type in ["Fluo-C2DL-Huh7", "Fluo-N2DH-GOWT1",
                         "Fluo-N3DH-CHO", "PhC-C2DH-U373"]:
            E = 50
        elif cell_type in ["Fluo-N2DL-HeLa", "PhC-C2DL-PSC",
                           "Fluo-C3DL-MDA231"]:
            E = 25
        else:
            E = 0
    else:
        if cell_type in ["Fluo-C2DL-Huh7", "Fluo-N2DH-GOWT1",
                         "Fluo-N3DH-CHO", "PhC-C2DH-U373",
                         "Fluo-C3DH-H157"]:
            E = 50
        elif cell_type in ["Fluo-N2DL-HeLa", "PhC-C2DL-PSC",
                           "Fluo-C3DL-MDA231"]:
            E = 25
        else:
            E = 0
    if E == 0:
        return list(arrays)
    out = []
    for a in arrays:
        if a.ndim == 2:
            out.append(a[E:a.shape[0] - E, E:a.shape[1] - E])
        else:
            out.append(a[:, E:a.shape[1] - E, E:a.shape[2] - E])
    return out


def _downscale(img: np.ndarray, scale: float, order: int) -> np.ndarray:
    """Adaptive downscale (reference downscale(), order 2 for images,
    order 0 for label/seed maps)."""
    from scipy.ndimage import zoom

    out = zoom(img, scale, order=order)
    return out.astype(img.dtype) if order == 0 else out


def crop_quality(img_crop: np.ndarray, mask_crop: np.ndarray,
                 cell_dist_crop: np.ndarray, settings: dict,
                 mode: str = "GT"):
    """Per-crop gates + A/B annotation-quality classification
    (reference generate_data, create_training_sets.py:252-281).

    Returns (quality, zero_neighbor): quality in {'A', 'B', None};
    zero_neighbor is True when only one cell remains in the crop (its
    neighbor map must be zeroed, a cut-off neighbor would poison it).
    """
    from scipy.ndimage import gaussian_filter

    min_area = settings["min_area"]
    h, w = mask_crop.shape[:2]

    # only cell fragments / no cell in the crop center
    if np.sum(mask_crop[10:-10, 10:-10] > 0) < min_area:
        return None, False

    mask_ids = set(np.unique(mask_crop).tolist()) - {0}

    # almost-background crop (with the GOWT1 zero-plateau carve-out)
    if np.sum(img_crop == 0) > (0.66 * h * w):
        if np.min(img_crop[:100, :100]) == 0:
            blurred = gaussian_filter(img_crop.astype(np.float32), sigma=1)
            if np.sum(blurred == 0) > (0.66 * h * w):
                return None, False
        else:
            return None, False

    if np.max(cell_dist_crop) < 0.8:
        return None, False

    # partially-visible cells (GT at scale 1: tracking seeds are smaller)
    n_part = 0
    if mode == "GT" and settings.get("scale", 1) == 1:
        for cell in region_props(mask_crop):
            if cell.area <= 0.1 * min_area:
                n_part += 1

    n_ids = len(mask_ids)
    # tra_gt is a copy of the mask in the vendored reference (the TRA load
    # is commented out at :767), so the expected count equals n_ids
    if (n_ids - n_part) >= n_ids:
        quality = "A"
    elif (n_ids - n_part) >= 0.8 * n_ids:
        quality = "B"
    else:
        return None, False
    return quality, n_ids == 1


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


def _ctc_gt_frames(root: str) -> set[str]:
    """Frames that carry a GT annotation ('<seq>_<frame>'), used to drop
    redundant ST crops in GT+ST mixing (reference
    get_annotated_gt_frames + remove_st_with_gt_annotation)."""
    frames = set()
    for seq in sorted(os.listdir(root)):
        seg_dir = join(root, f"{seq}_GT", "SEG") if seq.isdigit() else None
        if seg_dir and os.path.isdir(seg_dir):
            for seg_name in os.listdir(seg_dir):
                if seg_name.startswith("man_seg"):
                    frame = seg_name.replace("man_seg", "").split(".")[0]
                    frames.add(f"{seq}_{frame}")
    return frames


def create_distance_training_set(input_path: str, output_path: str,
                                 crop_size: int = 320,
                                 val_frac: float = 0.2,
                                 min_cell_area: int = 1,
                                 seed: int = 2022,
                                 ctc_mode: str | None = None,
                                 cell_type: str = "",
                                 st_limit: int = 280,
                                 frozen_split: str | None = None,
                                 cell_radius: int | None = None,
                                 neighbor_radius: int | None = None) -> dict:
    """Build a distance-regression training set.

    input_path: either NeurIPS format (images/ + labels/ with
    {stem}_label.tiff) or, with ctc_mode set (GT/ST/GT+ST), a Cell
    Tracking Challenge cell-type directory. min_cell_area is a floor on
    the statistics-derived min-area gate. frozen_split: JSON file with
    {"train": [crop ids], "val": [...]} to reproduce an exact split
    (the kit-sch-ge split-JSON analog).
    """
    if ctc_mode == "GT+ST":
        gt_pairs = [(i, l, "GT") for i, l in collect_ctc_pairs(input_path, "GT")]
        st_pairs = [(i, l, "ST") for i, l in
                    collect_ctc_pairs(input_path, "ST")[:st_limit]]
        # drop STs whose frame has a GT annotation (reference :700-704)
        gt_frames = _ctc_gt_frames(input_path)

        def st_frame(img_path):
            seq = os.path.basename(os.path.dirname(img_path))
            frame = os.path.basename(img_path)[1:].split(".")[0]
            return f"{seq}_{frame}"

        st_pairs = [p for p in st_pairs if st_frame(p[0]) not in gt_frames]
        pairs = gt_pairs + st_pairs
    elif ctc_mode:
        pairs = [(i, l, ctc_mode)
                 for i, l in collect_ctc_pairs(input_path, ctc_mode)]
        if ctc_mode == "ST":
            pairs = pairs[:st_limit]
    else:
        img_dir = join(input_path, "images")
        lbl_dir = join(input_path, "labels")
        pairs = [
            (join(img_dir, name),
             join(lbl_dir, name.split(".")[0] + "_label.tiff"), "GT")
            for name in sorted(os.listdir(img_dir))
        ]
    return _create_from_pairs(pairs, output_path, crop_size, val_frac,
                              min_cell_area, seed, cell_type=cell_type,
                              gt_st=(ctc_mode == "GT+ST"),
                              frozen_split=frozen_split,
                              cell_radius=cell_radius,
                              neighbor_radius=neighbor_radius)


def _create_from_pairs(pairs, output_path: str, crop_size: int,
                       val_frac: float, min_cell_area: int, seed: int,
                       cell_type: str = "", gt_st: bool = False,
                       frozen_split: str | None = None,
                       cell_radius: int | None = None,
                       neighbor_radius: int | None = None) -> dict:
    from ..pipeline.distance_labels import distance_label_2d

    os.makedirs(join(output_path, "train"), exist_ok=True)
    os.makedirs(join(output_path, "val"), exist_ok=True)

    # pass 1: dataset-wide settings from all labels; explicit radius
    # overrides win (the reference's formula — search radius mean+std
    # diameter — is tuned for dense cultures and can underserve sparse
    # data; see BASELINE.md)
    labels = [np.asarray(imread(lbl)) for _, lbl, _ in pairs]
    settings = compute_td_settings(labels, crop_size)
    settings["min_area"] = max(float(settings["min_area"]),
                               float(min_cell_area))
    cell_radius = cell_radius or int(np.ceil(0.5 * settings["max_mal"]))
    neighbor_radius = neighbor_radius or int(settings["search_radius"])
    scale = settings["scale"]

    # pass 2: distances, crop grid, quality gates
    crops = {"A": [], "B": []}  # (crop_id, mode, img, cell_d, neigh_d, mask)
    for i, ((img_file, _lbl_file, mode), lbl) in enumerate(zip(pairs, labels)):
        img = np.asarray(imread(img_file))
        if img.ndim == 3:
            img = img.mean(axis=-1)  # distance nets are single-channel
        lbl = np.asarray(lbl)
        if cell_type:
            img, lbl = foi_crop_train(cell_type, mode, img, lbl)
        if scale != 1.0:
            img = _downscale(img, scale, order=2)
            lbl = _downscale(lbl.astype(np.int32), scale, order=0)
        img = _minmax_uint16(img)

        cell_d, neigh_d = distance_label_2d(lbl.astype(np.int32),
                                            cell_radius, neighbor_radius)
        stem = f"{i:04d}_" + os.path.basename(img_file).split(".")[0]
        h, w = img.shape
        grid = [(y, x)
                for y in range(0, max(h - crop_size, 0) + 1, crop_size)
                for x in range(0, max(w - crop_size, 0) + 1, crop_size)
                if h >= crop_size and w >= crop_size]
        if not grid and h >= 1 and w >= 1:
            # small image: pad up to one full crop
            pad_h, pad_w = max(crop_size - h, 0), max(crop_size - w, 0)
            pad = lambda a: np.pad(a, ((0, pad_h), (0, pad_w)))
            img, lbl = pad(img), pad(lbl)
            cell_d, neigh_d = pad(cell_d), pad(neigh_d)
            grid = [(0, 0)]
        for k, (y, x) in enumerate(grid):
            sl = (slice(y, y + crop_size), slice(x, x + crop_size))
            quality, zero_neighbor = crop_quality(
                img[sl], lbl[sl], cell_d[sl], settings, mode)
            if quality is None:
                continue
            neigh_c = (np.zeros_like(neigh_d[sl]) if zero_neighbor
                       else neigh_d[sl])
            crop_id = f"{stem}_{mode}_{k:03d}"
            crops[quality].append(
                (crop_id, mode, img[sl], cell_d[sl], neigh_c, lbl[sl] > 0))

    # split: A-quality crops split train/val; B-quality are train-only and
    # only used when A crops are scarce (reference :858-861, ≤30)
    rng = np.random.RandomState(seed)
    a_ids = [c[0] for c in crops["A"]]
    if frozen_split:
        with open(frozen_split) as f:
            ids = json.load(f)
        split_of = {**{i: "train" for i in ids.get("train", [])},
                    **{i: "val" for i in ids.get("val", [])}}
    else:
        order = rng.permutation(len(a_ids))
        n_val = (max(1, int(np.floor(val_frac * len(a_ids))))
                 if len(a_ids) > 1 else 0)
        val_ids = {a_ids[j] for j in order[:n_val]}
        split_of = {cid: ("val" if cid in val_ids else "train")
                    for cid in a_ids}
        if len(crops["A"]) <= 30:
            for c in crops["B"]:
                split_of[c[0]] = "train"

    # GT+ST quotas (reference :694-733): keep all GT crops, cap added STs.
    # The reference skips the counter cap when frozen split ids are supplied
    # (create_training_sets.py:709-713) — a frozen split must be reproduced
    # verbatim, so the random pruning below must not run in that case.
    if gt_st and not frozen_split:
        by_split = {"train": [], "val": []}
        for c in crops["A"] + crops["B"]:
            s = split_of.get(c[0])
            if s:
                by_split[s].append(c)
        n_gt_train = sum(1 for c in by_split["train"] if c[1] == "GT")
        n_gt_val = sum(1 for c in by_split["val"] if c[1] == "GT")
        quota = {"train": max(int(0.33 * n_gt_train), 75 - n_gt_train),
                 "val": max(int(0.25 * n_gt_val), 15 - n_gt_val)}
        for s in ("train", "val"):
            st = [c for c in by_split[s] if c[1] == "ST"]
            rng.shuffle(st)
            for c in st[max(quota[s], 0):]:
                del split_of[c[0]]

    counts = {"train": 0, "val": 0}
    for c in crops["A"] + crops["B"]:
        crop_id, _mode, ic, cc, nc, mc = c
        split = split_of.get(crop_id)
        if split is None:
            continue
        np.savez_compressed(
            join(output_path, split, f"{crop_id}.npz"),
            img=ic.astype(np.uint16),
            dist_cell=cc.astype(np.float32),
            dist_neighbor=nc.astype(np.float32),
            mask=mc,
        )
        counts[split] += 1

    info = {"crop_size": crop_size, "counts": counts, "seed": seed,
            "scale": scale, "search_radius": neighbor_radius,
            "cell_radius": cell_radius, "max_mal": settings["max_mal"],
            "min_area": settings["min_area"],
            "n_quality_a": len(crops["A"]), "n_quality_b": len(crops["B"])}
    with open(join(output_path, "info.json"), "w") as f:
        json.dump(info, f, indent=2)
    with open(join(output_path, "split.json"), "w") as f:
        json.dump({"train": sorted(k for k, v in split_of.items()
                                   if v == "train"),
                   "val": sorted(k for k, v in split_of.items()
                                 if v == "val")}, f, indent=2)
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


def combine_training_sets(set_dirs: dict[str, str], output_path: str,
                          mode: str = "GT", seed: int = 2022,
                          n_max_train_gt_st: int = 150,
                          n_max_val_gt_st: int = 30) -> dict:
    """Combine per-cell-type trainsets into one multi-cell-type set with
    the reference's anti-imbalance selection
    (create_training_sets.py:868-975):

      - GT+ST: shuffled per-cell-type caps (n_max_train/n_max_val)
      - GT/ST: neighbor-aware subsampling — crops WITHOUT neighbor
        information are kept with a probability that shrinks as the
        per-type set grows (the p_no_neighbor ladder, :929-948)

    set_dirs: {cell_type: prepared trainset dir (train/ + val/ .npz)}.
    """
    import shutil

    rng = np.random.RandomState(seed)
    for split in ("train", "val"):
        os.makedirs(join(output_path, split), exist_ok=True)
    counts: dict = {"train": {}, "val": {}}

    for ct, src in set_dirs.items():
        files = {s: sorted(f for f in os.listdir(join(src, s))
                           if f.endswith(".npz"))
                 for s in ("train", "val")}
        if mode == "GT+ST":
            n_max = {"train": n_max_train_gt_st, "val": n_max_val_gt_st}
            for s in ("train", "val"):
                picks = list(files[s])
                rng.shuffle(picks)
                picks = picks[:n_max[s]]
                for f in picks:
                    shutil.copy(join(src, s, f),
                                join(output_path, s, f"{ct}_{f}"))
                counts[s][ct] = len(picks)
            continue

        n_total = len(files["train"]) + len(files["val"])
        p_neighbor, p_no_neighbor = 1.0, 1.0
        if mode == "ST":
            p_neighbor, p_no_neighbor = 0.9, 0.6
        elif mode == "GT":
            if n_total > 150:
                p_no_neighbor = 0.5
            elif n_total > 75:
                p_no_neighbor = 0.75
        for s in ("train", "val"):
            kept = 0
            for f in files[s]:
                z = np.load(join(src, s, f))
                has_neighbor = bool((z["dist_neighbor"] > 0).any())
                p = p_neighbor if has_neighbor else p_no_neighbor
                if rng.rand() > p:
                    continue
                shutil.copy(join(src, s, f),
                            join(output_path, s, f"{ct}_{f}"))
                kept += 1
            counts[s][ct] = kept

    counts["scale"] = 1
    with open(join(output_path, "info.json"), "w") as f:
        json.dump(counts, f, indent=2)
    return counts
