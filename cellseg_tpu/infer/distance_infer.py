"""Whole-image inference for the distance (DUNet) pipeline.

Parity targets from the reference (KIT-GE):
  - pad-to-tested-shape whole-image forward with explicit failure above
    8192 px ("Image too big to pad. Use sliding windows",
    segmentation/utils/utils.py:187-226) — here the whitelist is every
    multiple of 64 (XLA is shape-bucketed anyway);
  - optional CLAHE (ctc_dataset.py:91-104, via cv2), min-max → [-1,1]
    scaling (:107-117), optional down/upscale (:132-149, inference.py:108-113);
  - artifact correction: union of masks → 20×20 dilation → largest region
    kept (inference.py:123-142);
  - merge post-processing over Canny borders (postprocessing.py:146-161).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..decode.distance import decode_distance

MAX_PAD = 8192


def pad_to_bucket(img: np.ndarray, bucket: int = 64) -> tuple[np.ndarray, int, int]:
    h, w = img.shape[:2]
    ph = int(np.ceil(max(h, bucket) / bucket) * bucket)
    pw = int(np.ceil(max(w, bucket) / bucket) * bucket)
    if ph > MAX_PAD or pw > MAX_PAD:
        raise ValueError("Image too big to pad. Use sliding windows")
    pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad), h, w


def apply_clahe(img_u16: np.ndarray) -> np.ndarray:
    """CLAHE with the reference's clip limit (ctc_dataset.py:91-104)."""
    import cv2

    clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    return clahe.apply(img_u16.astype(np.uint16))


class DistancePredictor:
    """DUNet whole-image predictor with shape-bucketed jitted programs.

    tile_threshold > 0 routes images with max(H, W) > tile_threshold
    through the MXU-batched sliding-window engine (512² tiles, parity
    blend) instead of the whole-image forward: the whole-image DUNet at
    2048² is HBM-bound at 48.7 GB of traffic (74.8 ms, 79.5% of the v5e
    roofline) while 512²-tile batches lift arithmetic intensity 41 → 152
    and run 3.1× faster (24.0 ms, MFU 40.2%) — see BASELINE.md round 5.
    Default 0 keeps the reference's whole-image semantics
    (KIT-GE utils.py:187-226 pads whole images up to 8192 px)."""

    def __init__(self, apply_fn, params, th_cell: float = 0.07,
                 th_seed: float = 0.45, use_clahe: bool = False,
                 scale: float = 1.0, tile_threshold: int = 0,
                 roi: int = 512):
        self.apply_fn = apply_fn
        self.params = params
        self.th_cell = th_cell
        self.th_seed = th_seed
        self.use_clahe = use_clahe
        self.scale = scale
        self.tile_threshold = int(tile_threshold or 0)
        self.roi = roi
        self._jitted = {}

    def _forward(self, shape):
        if shape not in self._jitted:
            @jax.jit
            def f(params, x):
                border, cell = self.apply_fn(params, x[None])
                return border[0, ..., 0], cell[0, ..., 0]

            self._jitted[shape] = f
        return self._jitted[shape]

    def _forward_tiled(self, shape):
        key = ("tiled", shape)
        if key not in self._jitted:
            from .sliding_window import (balanced_sw_batch,
                                         sliding_window_inference,
                                         tile_origins)

            ph, pw = shape
            n_tiles = (len(tile_origins(ph, self.roi, 0.25))
                       * len(tile_origins(pw, self.roi, 0.25)))
            budget = max(1, int(128 * (256 / self.roi) ** 2))
            sw_batch = balanced_sw_batch(n_tiles, budget)

            def tiles_fn(p, t):
                border, cell = self.apply_fn(p, t)
                return jnp.concatenate([border, cell], axis=-1)

            @jax.jit
            def f(params, x):
                out = sliding_window_inference(
                    tiles_fn, params, x, roi=self.roi, sw_batch=sw_batch,
                    overlap=0.25, out_channels=2)
                return out[..., 0], out[..., 1]

            self._jitted[key] = f
        return self._jitted[key]

    def _run_forward(self, x: np.ndarray):
        """Normalized 2D float input → (border, cell) np arrays."""
        h, w = x.shape
        if self.tile_threshold and max(h, w) > self.tile_threshold:
            b = self.roi
            ph, pw = -(-h // b) * b, -(-w // b) * b
            padded = np.zeros((ph, pw, 1), np.float32)
            padded[:h, :w, 0] = x
            fwd = self._forward_tiled((ph, pw))
            border, cell = fwd(self.params, jnp.asarray(padded))
        else:
            padded, h, w = pad_to_bucket(x)
            fwd = self._forward(padded.shape)
            border, cell = fwd(self.params, jnp.asarray(padded[..., None]))
        return np.asarray(border)[:h, :w], np.asarray(cell)[:h, :w]

    def predict_volume(self, stack: np.ndarray, n_splitting: int = 40,
                       fuse_z_seeds: bool = False) -> np.ndarray:
        """(Z, H, W) stack → 3D instance labels: the 2D net runs per slice
        (the reference trains 2D nets and stacks slice predictions for 3D
        data, inference.py 3D usage), then the 3D decode
        (decode/distance3d.py) handles splitting/fusing/watershed."""
        from ..decode.distance3d import decode_distance_3d

        borders, cells = [], []
        for z in range(stack.shape[0]):
            b, c = self.predict_raw(stack[z])
            borders.append(b)
            cells.append(c)
        return decode_distance_3d(np.stack(borders), np.stack(cells),
                                  th_cell=self.th_cell,
                                  th_seed=self.th_seed,
                                  n_splitting=n_splitting,
                                  fuse_z_seeds=fuse_z_seeds)

    def predict_raw(self, img: np.ndarray):
        """2D image → (border, cell) float predictions (no decode)."""
        img = np.asarray(img)
        if img.ndim == 3:
            img = img.mean(axis=-1)
        lo, hi = float(img.min()), float(img.max())
        u16 = (65535 * (img.astype(np.float64) - lo) / max(hi - lo, 1e-9)
               ).astype(np.uint16)
        if self.use_clahe:
            u16 = apply_clahe(u16)
        x = u16.astype(np.float32) / 65535.0 * 2.0 - 1.0
        return self._run_forward(x)

    def predict(self, img: np.ndarray) -> np.ndarray:
        img = np.asarray(img)
        if img.ndim == 3:
            img = img.mean(axis=-1)
        # min-max → uint16 → optional CLAHE → [-1, 1]
        lo, hi = float(img.min()), float(img.max())
        u16 = (65535 * (img.astype(np.float64) - lo) / max(hi - lo, 1e-9)
               ).astype(np.uint16)
        if self.use_clahe:
            u16 = apply_clahe(u16)
        if self.scale != 1.0:
            import cv2

            u16 = cv2.resize(
                u16, None, fx=self.scale, fy=self.scale,
                interpolation=cv2.INTER_AREA if self.scale < 1 else
                cv2.INTER_LINEAR,
            )
        x = u16.astype(np.float32) / 65535.0 * 2.0 - 1.0
        border, cell = self._run_forward(x)
        # network-resolution raw heads (--save_raw_pred parity with
        # reference inference.py:118-121, which dumps pre-resize outputs)
        self.last_raw = (border, cell)
        labels = decode_distance(border, cell, th_cell=self.th_cell,
                                 th_seed=self.th_seed)
        if self.scale != 1.0:
            import cv2

            labels = cv2.resize(labels.astype(np.int32), None,
                                fx=1 / self.scale, fy=1 / self.scale,
                                interpolation=cv2.INTER_NEAREST)
            border = cv2.resize(border, None, fx=1 / self.scale,
                                fy=1 / self.scale,
                                interpolation=cv2.INTER_LINEAR)
        self.last_border = border
        return labels


def artifact_correction(results: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Keep only cells inside the largest dilated union-region across a
    result set (reference inference.py:123-142)."""
    from scipy import ndimage as ndi

    union = None
    for m in results.values():
        b = m > 0
        union = b if union is None else (union | b)
    if union is None:
        return results
    union = ndi.binary_dilation(union, np.ones((20, 20), bool))
    lab, n = ndi.label(union, structure=np.ones((3, 3), bool))
    if n == 0:
        return results
    areas = np.bincount(lab.ravel())
    areas[0] = 0
    roi = lab == int(np.argmax(areas))
    out = {}
    for k, m in results.items():
        keep_ids = np.unique(m[roi & (m > 0)])
        out[k] = np.where(np.isin(m, keep_ids), m, 0)
    return out


def apply_merging(labels: np.ndarray, border_pred: np.ndarray) -> np.ndarray:
    """Merge neighbor instances split by shape rather than by a predicted
    border (reference postprocessing.py:146-161, cv2.Canny based)."""
    import cv2
    from scipy import ndimage as ndi

    if labels.max() >= 255:
        return labels
    label_bin = labels > 0
    boundaries = cv2.Canny(labels.astype(np.uint8), 1, 1) > 0
    outer = cv2.Canny(label_bin.astype(np.uint8), 1, 1) > 0
    inner = boundaries ^ outer
    inner_lab, n = ndi.label(inner, structure=np.ones((3, 3), bool))
    out = labels.copy()
    for bid in range(1, n + 1):
        b = inner_lab == bid
        if b.sum() == 0:
            continue
        if border_pred[b].sum() / b.sum() < 0.075:
            dil = ndi.binary_dilation(b, np.ones((3, 3), bool))
            ids = np.unique(out[dil & (out > 0)])
            if len(ids) == 2:
                out[out == ids[1]] = ids[0]
    # relabel sequentially like the reference's measure.label pass
    from ..metrics import relabel_sequential

    return relabel_sequential(out)
