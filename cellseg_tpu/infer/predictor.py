"""End-to-end whole-image instance prediction, fully on device.

The reference predictor (baseline/predict.py:87-114) does per image:
  host percentile-normalize → H2D upload → sliding-window forward →
  D2H full softmax map → host skimage decode → write TIFF.

Here the entire chain — normalization, /max scaling, tiled inference,
softmax, hole/object filtering, connected components — is ONE jitted XLA
program per shape bucket; the only host transfer is the final int32 label
map. Shape bucketing (pad bottom/right to a multiple of `bucket`) bounds
recompilation across heterogeneous test sets; the pad region is masked out
of the decode so labels in the true image region are unaffected.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..decode.threeclass import decode_interior_prob
from ..pipeline.normalize import normalize_image_jax
from .sliding_window import sliding_window_inference


def _bucket_up(v: int, bucket: int, roi: int, stride: int) -> int:
    """Padded size for one axis.

    bucket <= 1: pad only to the ROI (exact MONAI clamped tiling, general
    accumulation path). Otherwise prefer a stride-uniform pad
    (p ≡ roi mod stride → the parity-reshape fast blend applies) unless it
    overshoots the plain bucket pad by more than ~15% per axis. The blend
    fast path is worth real money: at 2048² the general accumulation path
    sync-times ~440 ms vs ~280 ms for the uniform grid at 2176² — the ~13%
    extra pixels cost far less in normalize/decode/transfer than the
    scatter-accumulate blend does.
    """
    v = max(v, roi)
    if bucket <= 1:
        return v
    p_bucket = int(np.ceil(v / bucket) * bucket)
    p_uniform = roi + int(np.ceil(max(v - roi, 0) / stride) * stride)
    if p_uniform <= p_bucket * 1.15:
        return p_uniform
    return p_bucket


class Predictor:
    """3-class sliding-window instance predictor.

    apply_fn(params, tiles): (B, roi, roi, 3) → (B, roi, roi, num_class).
    """

    def __init__(self, apply_fn, params, roi: int = 256,
                 sw_batch: int | str = "auto",
                 overlap: float = 0.25, num_class: int = 3,
                 mode: str = "constant", bucket: int = 256,
                 normalize: bool = True, decode: str = "cc",
                 tta: bool = False):
        self.apply_fn = apply_fn
        self.params = params
        self.roi = roi
        # "auto" sizes the per-step tile batch to the slide (balanced
        # ceil-division against a 128-tile budget): the reference's
        # sw_batch=4 (predict.py:109) is a GPU memory knob, but on TPU the
        # 16/32-channel UNet levels only fill the MXU when many tiles are
        # batched — measured 26.3 → 7.5 ms for the 2176² forward going from
        # 16 to 128 tiles/step — while a FIXED 128 pads 144 tiles up to 256
        # (78% duplicate forwards; see sliding_window.balanced_sw_batch).
        # Results are bit-identical for any batching (same tiles, blend).
        self.sw_batch = sw_batch
        self.overlap = overlap
        self.num_class = num_class
        self.mode = mode
        self.bucket = bucket
        self.normalize = normalize
        # "cc": reference parity (CC on interior, predict.py:113);
        # "boundary_watershed": beyond-parity splitter for touching cells
        # (decode/threeclass.py:decode_boundary_watershed)
        self.decode = decode
        # dihedral test-time augmentation (beyond parity, opt-in): average
        # the softmax over the 8 flip/rot90 views before decoding. ~8× the
        # forward cost (the forward is ~1/5 of the decode budget at 4.2 MP,
        # BASELINE.md), sharper boundary ridges where CC merges leak.
        self.tta = tta
        self._jitted = {}

    def _program(self, ph: int, pw: int, c_in: int = 3):
        """Build (and cache) the per-shape program.

        Three separately-jitted stages (normalize+scale, tiled forward,
        decode) chained through device-resident arrays: identical data flow
        to one fused jit, but compile time is the sum of the parts (one
        giant program tips XLA's fusion passes into pathological compile
        times at whole-slide sizes).
        """
        key = (ph, pw, c_in)
        if key in self._jitted:
            return self._jitted[key]

        @jax.jit
        def stage_norm(padded_u8):
            if self.normalize:
                norm = normalize_image_jax(padded_u8).astype(jnp.float32)
            else:
                norm = padded_u8.astype(jnp.float32)
            # channel fixup ON DEVICE (host repeat would triple the H2D
            # transfer): grayscale → 3-repeat, 2ch → zero-pad. Identical to
            # the reference's host fixup since per-channel normalization
            # commutes with repeating/zero-padding channels.
            if norm.shape[-1] == 1:
                norm = jnp.repeat(norm, 3, axis=-1)
            elif norm.shape[-1] == 2:
                norm = jnp.concatenate(
                    [norm, jnp.zeros_like(norm[..., :1])], axis=-1)
            # reference: test_npy01 = pre_img_data / np.max(pre_img_data)
            denom = jnp.maximum(jnp.max(norm), 1e-8)
            return norm / denom

        boundary_ws = self.decode == "boundary_watershed"

        if self.sw_batch == "auto":
            from .sliding_window import balanced_sw_batch, tile_origins

            n_tiles = (len(tile_origins(ph, self.roi, self.overlap))
                       * len(tile_origins(pw, self.roi, self.overlap)))
            sw_batch = balanced_sw_batch(n_tiles)
        else:
            sw_batch = self.sw_batch

        def _probs(params, x):
            logits = sliding_window_inference(
                self.apply_fn, params, x, roi=self.roi,
                sw_batch=sw_batch, overlap=self.overlap,
                out_channels=self.num_class, mode=self.mode,
            )
            return jax.nn.softmax(logits, axis=-1)

        @jax.jit
        def stage_forward(params, np01):
            if self.tta:
                # 8 dihedral views, inverse-mapped and averaged. rot90 on
                # a non-square canvas transposes the tile grid — each view
                # is its own tiling, which is fine: TTA is an ensemble,
                # not a parity path.
                acc = None
                for k in range(4):
                    for flip in (False, True):
                        xt = jnp.rot90(np01, k, axes=(0, 1))
                        if flip:
                            xt = xt[:, ::-1]
                        pt = _probs(params, xt)
                        if flip:
                            pt = pt[:, ::-1]
                        pt = jnp.rot90(pt, -k, axes=(0, 1))
                        acc = pt if acc is None else acc + pt
                probs = acc / 8.0
            else:
                probs = _probs(params, np01)
            if boundary_ws:
                return probs[..., 1:3]  # interior + boundary
            return probs[..., 1]

        @jax.jit
        def stage_decode(fwd_out, true_h, true_w):
            rows = jnp.arange(ph)[:, None]
            cols = jnp.arange(pw)[None, :]
            valid = (rows < true_h) & (cols < true_w)
            if boundary_ws:
                from ..decode.threeclass import decode_boundary_watershed

                interior = jnp.where(valid, fwd_out[..., 0], 0.0)
                boundary = jnp.where(valid, fwd_out[..., 1], 0.0)
                labels = decode_boundary_watershed(interior, boundary)
            else:
                interior = jnp.where(valid, fwd_out, 0.0)
                labels = decode_interior_prob(interior)
            # uint16 halves the D2H transfer; cell counts stay below 65k
            return labels.astype(jnp.uint16)

        def run(params, padded_u8, true_h, true_w):
            np01 = stage_norm(padded_u8)
            interior = stage_forward(params, np01)
            labels = stage_decode(interior, true_h, true_w)
            return labels, interior

        self._jitted[key] = run
        return run

    def predict(self, img: np.ndarray) -> np.ndarray:
        """Raw image (H, W[, C]) or multipage stack (N, H, W) → int32
        instance label map (H, W); pages are treated as channel planes
        (see io.to_hwc3). Grayscale uploads one channel; the 3-channel
        expansion happens on device."""
        from ..io.images import to_hwc_raw

        img = to_hwc_raw(img)
        h, w, c = img.shape
        stride = max(int(self.roi * (1 - self.overlap)), 1)
        ph = _bucket_up(h, self.bucket, self.roi, stride)
        pw = _bucket_up(w, self.bucket, self.roi, stride)
        padded = np.zeros((ph, pw, c), img.dtype)
        padded[:h, :w] = img
        run = self._program(ph, pw, c)
        labels, _ = run(self.params, jnp.asarray(padded),
                        jnp.int32(h), jnp.int32(w))
        return np.asarray(labels)[:h, :w].astype(np.int32)

    def predict_timed(self, img: np.ndarray) -> tuple[np.ndarray, float]:
        """Predict with wall-clock timing (post-compilation steady state)."""
        t0 = time.perf_counter()
        out = self.predict(img)
        return out, time.perf_counter() - t0

    def predict_many(self, imgs, depth: int = 2):
        """Pipelined multi-image prediction (generator of label maps).

        JAX's async dispatch overlaps image i+1's upload + compute with
        image i's device→host label transfer; `depth` bounds in-flight
        work. Same results as sequential predict()."""
        from collections import deque

        pending: deque = deque()

        def materialize(item):
            labels, h, w = item
            return np.asarray(labels)[:h, :w].astype(np.int32)

        from ..io.images import to_hwc_raw

        for img in imgs:
            img = to_hwc_raw(img)
            h, w, c = img.shape
            stride = max(int(self.roi * (1 - self.overlap)), 1)
            ph = _bucket_up(h, self.bucket, self.roi, stride)
            pw = _bucket_up(w, self.bucket, self.roi, stride)
            padded = np.zeros((ph, pw, c), img.dtype)
            padded[:h, :w] = img
            run = self._program(ph, pw, c)
            labels, _ = run(self.params, jnp.asarray(padded),
                            jnp.int32(h), jnp.int32(w))
            pending.append((labels, h, w))
            while len(pending) > depth:
                yield materialize(pending.popleft())
        while pending:
            yield materialize(pending.popleft())
