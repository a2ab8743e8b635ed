"""Flow-field (cellpose-style) whole-image inference engine.

Capability parity with the reference's cellpose eval wrappers
(cellpose-omnipose-KIT-GE/test_cellpose_cyto2_grey.py:16-34), including the
`diameter=None` auto-sizing semantics (:33): when no diameter is given, a
first pass estimates the median cell diameter from the decoded masks and,
if it deviates from the model's nominal diameter, the image is rescaled to
nominal size and re-segmented (cellpose SizeModel-style two-pass).

Large images route through the tiled sliding-window engine instead of one
whole-image jit — a gigapixel input neither OOMs nor churns per-shape
compiles (the flow/cellprob channels blend exactly like logits).
"""

from __future__ import annotations

import numpy as np

NOMINAL_DIAMETER = 30.0  # cellpose cyto2 diam_mean


def estimate_diameter(labels: np.ndarray) -> float:
    """Median equivalent diameter of decoded instances (0 if none)."""
    ids, counts = np.unique(labels[labels > 0], return_counts=True)
    if ids.size == 0:
        return 0.0
    return float(np.median(np.sqrt(4.0 * counts / np.pi)))


class FlowPredictor:
    """Grey image → instance labels through the flow model.

    apply_fn(params, x): (B, H, W, 1) → (flow (B, H, W, 2), cellprob
    (B, H, W, 1)). diameter=None enables the auto-sizing two-pass.
    """

    def __init__(self, apply_fn, params, prob_threshold: float = 0.0,
                 n_iter: int = 100, diam_mean: float = NOMINAL_DIAMETER,
                 tile_threshold: int = 1024, roi: int = 512,
                 sw_batch: int | str = "auto", omni: bool = False,
                 method: str | None = None, omni_head: bool = False):
        self.apply_fn = apply_fn
        self.params = params
        self.prob_threshold = prob_threshold
        self.n_iter = n_iter
        self.diam_mean = diam_mean
        self.tile_threshold = tile_threshold
        self.roi = roi
        self.sw_batch = sw_batch
        self.omni = omni
        # omni_head: the model carries the omnipose-representation head
        # (FlowNet(omni=True): aux = (dist, boundary_logit) instead of a
        # 1-channel cell logit; the decode mask is dist > threshold,
        # threshold 0 by construction — background regresses to −1).
        # Basin cores come from the interior ridge dist > core_threshold
        # (connected along elongated cells, separated at contacts where
        # both sides regress dist ≈ 1; a point-attractor core rule
        # fragments along the skeletons omni flows converge to).
        self.omni_head = omni_head
        self.core_threshold = 2.0
        # Boundary-head core cut: the omni head regresses a boundary logit
        # alongside dist; cores crossing a predicted contact line are cut
        # (boundary_logit < boundary_cut keeps a core pixel). Measured on
        # the rod set: merges 7→1 per ~60-cell image vs dist-only cores
        # (the omnipose role of the boundary field in mask reconstruction,
        # cellpose-omnipose-KIT-GE/test_omnipose_cyto2_grey.py:23-28).
        self.boundary_cut = -2.0
        # explicit method wins; else the omnipose REPRESENTATION decodes
        # with the same bounded-window tracker (its ∇φ flows are unit
        # vectors too); the legacy omni FLAG without the head selects the
        # suppressed-Euler tracking analog
        self.method = method or (
            "omni" if (omni and not omni_head) else "propagate")
        self._jitted = {}

    # -- single-scale forward + decode ------------------------------------

    def _forward_decode(self, grey: np.ndarray) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        from ..decode.flow import decode_flow

        method = self.method
        h, w = grey.shape
        if max(h, w) > self.tile_threshold:
            # tiled path: blend flow+cellprob channels like logits.
            # "auto" batches tiles to fill the MXU (the small-channel UNet
            # levels need many tiles per step — see infer/predictor.py),
            # scaled by tile area against the 128-tiles-at-256² budget.
            if self.sw_batch == "auto":
                from .sliding_window import balanced_sw_batch, tile_origins

                b = self.roi
                ph_, pw_ = -(-h // b) * b, -(-w // b) * b
                n_tiles = (len(tile_origins(ph_, self.roi, 0.25))
                           * len(tile_origins(pw_, self.roi, 0.25)))
                budget = max(1, int(128 * (256 / self.roi) ** 2))
                sw_batch = balanced_sw_batch(n_tiles, budget)
            else:
                sw_batch = self.sw_batch
            key = ("tiled", sw_batch)
            if key not in self._jitted:
                from .sliding_window import sliding_window_inference

                n_out = 4 if self.omni_head else 3

                def tiles_fn(p, t):
                    flow, aux = self.apply_fn(p, t)
                    return jnp.concatenate([flow, aux], axis=-1)

                omni_head = self.omni_head
                core_th = self.core_threshold
                bnd_cut = self.boundary_cut

                @jax.jit
                def f(p, x):
                    out = sliding_window_inference(
                        tiles_fn, p, x, roi=self.roi,
                        sw_batch=sw_batch, overlap=0.25,
                        out_channels=n_out)
                    # omni head: channel 2 is the regressed distance
                    # field — thresholding it IS the mask rule (dist > 0)
                    # and the interior ridge (dist > core_th), cut at the
                    # predicted boundary (channel 3), seeds the basins
                    # (see decode_flow `cores`)
                    cores = (jnp.logical_and(out[..., 2] > core_th,
                                             out[..., 3] < bnd_cut)
                             if omni_head else None)
                    return decode_flow(out[..., :2], out[..., 2],
                                       self.prob_threshold, self.n_iter,
                                       method=method, cores=cores)

                self._jitted[key] = f
            # pad to a multiple of the roi stride for bounded compiles
            b = self.roi
            ph, pw = -(-h // b) * b, -(-w // b) * b
            padded = np.zeros((ph, pw, 1), np.float32)
            padded[:h, :w, 0] = grey
            out = self._jitted[key](self.params, jnp.asarray(padded))
            return np.asarray(out)[:h, :w]

        # whole-image path, pad to multiple of 32 for the conv strides
        ph, pw = -(-h // 32) * 32, -(-w // 32) * 32
        key = (ph, pw)
        if key not in self._jitted:
            omni_head = self.omni_head
            core_th = self.core_threshold
            bnd_cut = self.boundary_cut

            @jax.jit
            def f(p, x):
                flow, aux = self.apply_fn(p, x[None])
                cores = (jnp.logical_and(aux[0, ..., 0] > core_th,
                                         aux[0, ..., 1] < bnd_cut)
                         if omni_head else None)
                return decode_flow(flow[0], aux[0, ..., 0],
                                   self.prob_threshold, self.n_iter,
                                   method=method, cores=cores)

            self._jitted[key] = f
        padded = np.zeros((ph, pw, 1), np.float32)
        padded[:h, :w, 0] = grey
        out = self._jitted[key](self.params, jnp.asarray(padded))
        return np.asarray(out)[:h, :w]

    # -- public API -------------------------------------------------------

    def predict(self, img: np.ndarray,
                diameter: float | None = None) -> np.ndarray:
        """img: (H, W[, C]) any dtype → int32 instance labels (H, W).

        diameter=None: first pass at native scale estimates the median
        cell diameter; if it is off nominal by >20%, rescale to nominal
        and re-segment (reference test_cellpose_cyto2_grey.py:33
        `diameter=None` behavior). diameter=<px>: rescale directly.
        """
        from scipy.ndimage import zoom

        img = np.asarray(img)
        if img.ndim == 3:
            img = img.mean(axis=-1)
        lo, hi = float(img.min()), float(img.max())
        grey = (img.astype(np.float32) - lo) / max(hi - lo, 1e-9)

        if diameter is not None and diameter > 0:
            factor = float(np.clip(self.diam_mean / diameter, 0.25, 4.0))
            return self._predict_scaled(grey, factor)

        labels = self._forward_decode(grey)
        est = estimate_diameter(labels)
        if est <= 0:
            return labels.astype(np.int32)
        factor = float(np.clip(self.diam_mean / est, 0.25, 4.0))
        if 0.8 <= factor <= 1.2:  # already near nominal size
            return labels.astype(np.int32)
        return self._predict_scaled(grey, factor, zoom_fn=zoom)

    def _predict_scaled(self, grey: np.ndarray, factor: float,
                        zoom_fn=None) -> np.ndarray:
        from scipy.ndimage import zoom

        zoom_fn = zoom_fn or zoom
        if abs(factor - 1.0) < 1e-3:
            return self._forward_decode(grey).astype(np.int32)
        scaled = zoom_fn(grey, factor, order=1)
        labels = self._forward_decode(scaled)
        # nearest-neighbor map back to the native grid (keeps instance ids)
        h, w = grey.shape
        yi = np.clip((np.arange(h) * factor).astype(np.int64), 0,
                     labels.shape[0] - 1)
        xi = np.clip((np.arange(w) * factor).astype(np.int64), 0,
                     labels.shape[1] - 1)
        return labels[np.ix_(yi, xi)].astype(np.int32)
