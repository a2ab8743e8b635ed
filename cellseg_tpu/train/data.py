"""Host-side training data: load, split, pad, crop, and batch.

The reference runs MONAI Datasets through multi-process PyTorch DataLoaders
(baseline/model_training_3class.py:165-188). Here the host's only jobs are
file IO, the seeded 90/10 split (reference :97-114), SpatialPad, and random
256² crop extraction (cheap slicing); everything mathematical happens on
device (pipeline/augment.py). A double-buffered background thread keeps the
TPU fed.
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass

import numpy as np

from ..io import imread


@dataclass
class SamplePair:
    image: np.ndarray  # (H, W, 3) uint8
    label: np.ndarray  # (H, W) uint8/int


def split_train_val(img_path: str, gt_path: str, seed: int = 2022,
                    val_frac: float = 0.1, label_suffix: str = "_label.png"):
    """Seeded shuffle split; file pairing matches the reference
    (model_training_3class.py:97-114)."""
    img_names = sorted(os.listdir(img_path))
    gt_names = [n.split(".")[0] + label_suffix for n in img_names]
    rng = np.random.RandomState(seed)
    indices = np.arange(len(img_names))
    rng.shuffle(indices)
    val_split = int(len(img_names) * val_frac)
    if val_split == 0 and len(img_names) >= 2 and val_frac > 0:
        # tiny corpora (e.g. the 9-patch real-data anchor): an empty val
        # set silently disables best-checkpoint selection and early
        # stopping — always hold out at least one image
        val_split = 1
    val_idx, train_idx = indices[:val_split], indices[val_split:]

    def files(idx):
        return [
            (os.path.join(img_path, img_names[i]),
             os.path.join(gt_path, gt_names[i]))
            for i in idx
        ]

    return files(train_idx), files(val_idx)


def load_pair(img_file: str, gt_file: str) -> SamplePair:
    img = np.asarray(imread(img_file))
    lbl = np.asarray(imread(gt_file))
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    elif img.shape[-1] > 3:
        img = img[..., :3]
    return SamplePair(image=img.astype(np.uint8), label=lbl)


def pad_to_min(arr: np.ndarray, size: int) -> np.ndarray:
    """Symmetric zero pad to at least (size, size) (MONAI SpatialPadd)."""
    h, w = arr.shape[:2]
    ph, pw = max(0, size - h), max(0, size - w)
    pad = [(ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)]
    if arr.ndim == 3:
        pad.append((0, 0))
    if ph or pw:
        arr = np.pad(arr, pad, mode="constant")
    return arr


class CropDataset:
    """In-memory dataset yielding random (input_size)² crops.

    Images are loaded once and kept as uint8 (cheap); each __getitem__ picks
    a random crop window (RandSpatialCropd semantics).
    """

    def __init__(self, files: list[tuple[str, str]], input_size: int = 256,
                 seed: int = 2022):
        self.samples = [load_pair(i, g) for i, g in files]
        self.samples = [
            SamplePair(pad_to_min(s.image, input_size),
                       pad_to_min(s.label, input_size))
            for s in self.samples
        ]
        self.input_size = input_size
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.samples)

    def crop(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        s = self.samples[idx]
        h, w = s.image.shape[:2]
        sz = self.input_size
        y = self.rng.randint(0, h - sz + 1)
        x = self.rng.randint(0, w - sz + 1)
        return (s.image[y:y + sz, x:x + sz],
                s.label[y:y + sz, x:x + sz].astype(np.int32))

    def batches(self, batch_size: int, steps: int):
        """Yield `steps` random batches of stacked crops."""
        n = len(self.samples)
        for _ in range(steps):
            idx = self.rng.randint(0, n, size=batch_size)
            imgs, lbls = zip(*(self.crop(i) for i in idx))
            yield np.stack(imgs), np.stack(lbls)

    def epoch_batches(self, batch_size: int, drop_last: bool = False):
        """One shuffled pass over the dataset (reference epoch semantics)."""
        order = self.rng.permutation(len(self.samples))
        for start in range(0, len(order), batch_size):
            chunk = order[start:start + batch_size]
            if len(chunk) < batch_size:
                if drop_last:
                    return
                # repeat-pad the final partial batch to keep shapes static
                chunk = np.concatenate(
                    [chunk, order[: batch_size - len(chunk)]]
                )
            imgs, lbls = zip(*(self.crop(i) for i in chunk))
            yield np.stack(imgs), np.stack(lbls)


def prefetch(generator, depth: int = 2):
    """Run a batch generator in a background thread with a bounded queue."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for item in generator:
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
