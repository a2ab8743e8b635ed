"""Scalar/event logging: JSONL always, TensorBoard when available.

The reference logs per-step train loss and per-val-round dice to TensorBoard
(model_training_3class.py:246,265,321). TensorBoard isn't guaranteed in this
environment, so the primary sink is an append-only JSONL events file that
any dashboard can tail; a TB SummaryWriter is attached opportunistically.
"""

from __future__ import annotations

import json
import os
import time


class ScalarLogger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, "events.jsonl")
        self._f = open(self._path, "a", buffering=1)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(json.dumps({
            "t": time.time(), "tag": tag, "value": float(value),
            "step": int(step),
        }) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def image(self, tag: str, array, step: int) -> None:
        """Snapshot an image (validation input/label/prediction), the
        reference's plot_2d_or_3d_image role (model_training_3class.py:
        321-325). Written as PNG under log_dir/images (+ TB if present)."""
        import numpy as np

        arr = np.asarray(array)
        if arr.ndim == 2:
            arr = arr[..., None]
        lo, hi = float(arr.min()), float(arr.max())
        norm = (arr - lo) / max(hi - lo, 1e-9)
        u8 = (norm * 255).astype(np.uint8)
        if u8.shape[-1] == 1:
            u8 = np.repeat(u8, 3, axis=-1)
        img_dir = os.path.join(os.path.dirname(self._path), "images")
        os.makedirs(img_dir, exist_ok=True)
        from PIL import Image

        Image.fromarray(u8[..., :3]).save(
            os.path.join(img_dir, f"{tag.replace('/', '_')}_{step}.png"))
        if self._tb is not None:
            self._tb.add_image(tag, u8.transpose(2, 0, 1), step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
