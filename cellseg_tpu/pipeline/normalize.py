"""Percentile intensity normalization (host + on-device).

Reference semantics (data/pre_process_3class.py:22-29, baseline/predict.py:14-21):
per channel, take the 1st/99th percentile of the NONZERO pixels, then
linearly rescale the full channel into uint8 range with clipping
(skimage.exposure.rescale_intensity(..., out_range='uint8')), truncating
(not rounding) on the final uint8 cast. Channels that are all zero stay zero;
channels with a degenerate percentile range (<= 0.001) pass through unscaled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def normalize_channel(img: np.ndarray, lower: float = 1, upper: float = 99) -> np.ndarray:
    """Host single-channel percentile normalization → uint8."""
    img = np.asarray(img)
    non_zero_vals = img[np.nonzero(img)]
    if non_zero_vals.size == 0:
        return img.astype(np.uint8)
    p_lo, p_hi = np.percentile(non_zero_vals, [lower, upper])
    if p_hi - p_lo > 0.001:
        clipped = np.clip(img.astype(np.float64), p_lo, p_hi)
        img_norm = (clipped - p_lo) / (p_hi - p_lo) * 255.0
    else:
        img_norm = img
    return img_norm.astype(np.uint8)


def normalize_image(img: np.ndarray, lower: float = 1, upper: float = 99) -> np.ndarray:
    """Host whole-image normalization with the reference's channel fixup.

    Grayscale → 3-channel repeat; >3 channels → first 3; per-channel
    normalization skipping all-zero channels
    (reference baseline/predict.py:93-104).
    """
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    elif img.ndim == 3 and img.shape[-1] > 3:
        img = img[:, :, :3]
    out = np.zeros(img.shape, dtype=np.uint8)
    for i in range(3):
        ch = img[:, :, i]
        if np.count_nonzero(ch):
            out[:, :, i] = normalize_channel(ch, lower, upper)
    return out


@functools.partial(jax.jit, static_argnames=("lower", "upper"))
def normalize_image_jax(img: jax.Array, lower: float = 1.0, upper: float = 99.0) -> jax.Array:
    """On-device (H, W, 3) percentile normalization → uint8.

    XLA-native equivalent of normalize_image: the nonzero-only percentile is
    computed by sorting each channel with zeros pushed to +inf and indexing
    the percentile positions among the first `n_nonzero` entries (linear
    interpolation, matching np.percentile). Fuses with downstream /max
    scaling in the predictor so raw bytes → model-ready floats never
    round-trip to host.
    """
    h, w, c = img.shape
    x = img.astype(jnp.float32).reshape(h * w, c)

    def norm_one(ch: jax.Array) -> jax.Array:
        n_nonzero = jnp.sum(ch != 0)
        sort_keys = jnp.where(ch == 0, jnp.inf, ch)
        s = jnp.sort(sort_keys)

        def pct(q):
            # np.percentile linear interpolation over the first n_nonzero
            # sorted nonzero values.
            pos = (q / 100.0) * (n_nonzero - 1).astype(jnp.float32)
            lo_idx = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, h * w - 1)
            hi_idx = jnp.clip(lo_idx + 1, 0, h * w - 1)
            frac = pos - lo_idx.astype(jnp.float32)
            lo_v = s[lo_idx]
            hi_v = jnp.where(hi_idx < n_nonzero, s[hi_idx], lo_v)
            return lo_v + frac * (hi_v - lo_v)

        p_lo, p_hi = pct(lower), pct(upper)
        scaled = jnp.clip(ch, p_lo, p_hi)
        scaled = (scaled - p_lo) / (p_hi - p_lo) * 255.0
        out = jnp.where(p_hi - p_lo > 0.001, scaled, ch)
        out = jnp.where(n_nonzero > 0, out, jnp.zeros_like(ch))
        # Match numpy's truncating uint8 cast.
        return jnp.clip(jnp.floor(out), 0, 255)

    out = jax.vmap(norm_one, in_axes=1, out_axes=1)(x)
    return out.reshape(h, w, c).astype(jnp.uint8)
