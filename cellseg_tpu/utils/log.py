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

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
