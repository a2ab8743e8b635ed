"""On-device training augmentation chain (pure jnp over PRNG keys).

Distributional-parity rebuild of the reference MONAI transform chain
(baseline/model_training_3class.py:119-151): scale-intensity, random crop,
axis flip, rot90, Gaussian noise, gamma contrast, Gaussian smoothing,
histogram shift, and zoom. All transforms are static-shape, jit- and
vmap-friendly, so the whole chain fuses into the forward step on TPU: a
batch of uint8 crops streams from host and every random op happens on
device (the reference runs this chain in Python DataLoader workers).

Exact RNG parity with MONAI is impossible and not required (SURVEY.md §7.3);
each transform matches MONAI's sampling distributions and math.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AugmentConfig(NamedTuple):
    prob_flip: float = 0.5
    prob_rot90: float = 0.5
    prob_noise: float = 0.25
    noise_std: float = 0.1
    prob_contrast: float = 0.25
    gamma_range: tuple = (1.0, 2.0)
    prob_smooth: float = 0.25
    sigma_x_range: tuple = (1.0, 2.0)
    sigma_y_range: tuple = (0.25, 1.5)
    prob_hist_shift: float = 0.25
    num_control_points: int = 3
    prob_zoom: float = 0.15
    zoom_range: tuple = (0.8, 1.5)


def scale_intensity(img: jax.Array) -> jax.Array:
    """Min-max scale to [0,1] (MONAI ScaleIntensityd defaults)."""
    lo = jnp.min(img)
    hi = jnp.max(img)
    return jnp.where(hi > lo, (img - lo) / (hi - lo), jnp.zeros_like(img))


def random_axis_flip(key, img, lbl, prob):
    """Flip along one randomly chosen spatial axis (RandAxisFlipd)."""
    k_do, k_axis = jax.random.split(key)
    do = jax.random.uniform(k_do) < prob
    axis_is_0 = jax.random.bernoulli(k_axis)
    f_img = jnp.where(axis_is_0, img[::-1, :, :], img[:, ::-1, :])
    f_lbl = jnp.where(axis_is_0, lbl[::-1, :], lbl[:, ::-1])
    return (jnp.where(do, f_img, img), jnp.where(do, f_lbl, lbl))


def random_rot90(key, img, lbl, prob, max_k: int = 3):
    """Rotate by 90° k∈[1,max_k] times with probability prob (RandRotate90d).

    Requires square spatial dims (true for training crops)."""
    k_do, k_k = jax.random.split(key)
    do = jax.random.uniform(k_do) < prob
    k = jnp.where(do, jax.random.randint(k_k, (), 1, max_k + 1), 0)

    def rot(x):
        branches = [lambda v=v: jnp.rot90(x, v, axes=(0, 1)) for v in range(4)]
        return jax.lax.switch(k, branches)

    return rot(img), rot(lbl)


def random_gaussian_noise(key, img, prob, std):
    """Additive Gaussian noise; std itself sampled U(0, std) like MONAI."""
    k_do, k_std, k_noise = jax.random.split(key, 3)
    do = jax.random.uniform(k_do) < prob
    s = jax.random.uniform(k_std) * std
    noise = jax.random.normal(k_noise, img.shape, img.dtype) * s
    return jnp.where(do, img + noise, img)


def random_gamma_contrast(key, img, prob, gamma_range):
    """Gamma contrast preserving the intensity range (RandAdjustContrastd)."""
    k_do, k_g = jax.random.split(key)
    do = jax.random.uniform(k_do) < prob
    gamma = jax.random.uniform(
        k_g, minval=gamma_range[0], maxval=gamma_range[1]
    )
    lo, hi = jnp.min(img), jnp.max(img)
    rng_ = jnp.maximum(hi - lo, 1e-7)
    adjusted = ((img - lo) / rng_) ** gamma * rng_ + lo
    return jnp.where(do, adjusted, img)


def _gaussian_kernel1d(sigma: jax.Array, radius: int) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def separable_gaussian_blur(img: jax.Array, sigma_y: jax.Array,
                            sigma_x: jax.Array, radius: int = 8,
                            pad_mode: str = "reflect") -> jax.Array:
    """Depthwise separable Gaussian blur, (H, W, C).

    pad_mode: numpy pad mode for the borders. NOTE scipy's
    gaussian_filter default mode='reflect' repeats the edge sample —
    that is numpy/jnp 'symmetric', NOT jnp 'reflect' (scipy calls the
    latter 'mirror'); decode paths chasing scipy bit-parity must pass
    pad_mode='symmetric'."""
    ky = _gaussian_kernel1d(sigma_y, radius)
    kx = _gaussian_kernel1d(sigma_x, radius)

    def conv_axis(x, k, axis):
        pad = [(0, 0)] * 3
        pad[axis] = (radius, radius)
        xp = jnp.pad(x, pad, mode=pad_mode)
        # shift-and-add formulation: static unrolled taps keep this a pure
        # VPU fusion instead of a gather
        out = jnp.zeros_like(x)
        for i in range(2 * radius + 1):
            sl = [slice(None)] * 3
            sl[axis] = slice(i, i + x.shape[axis])
            out = out + k[i] * xp[tuple(sl)]
        return out

    return conv_axis(conv_axis(img, ky, 0), kx, 1)


def random_gaussian_smooth(key, img, prob, sigma_x_range, sigma_y_range):
    k_do, k_sx, k_sy = jax.random.split(key, 3)
    do = jax.random.uniform(k_do) < prob
    sx = jax.random.uniform(k_sx, minval=sigma_x_range[0], maxval=sigma_x_range[1])
    sy = jax.random.uniform(k_sy, minval=sigma_y_range[0], maxval=sigma_y_range[1])
    # MONAI RandGaussianSmoothd convention: sigma_x is the FIRST spatial
    # dimension (rows), sigma_y the second — the reference chain sets only
    # sigma_x=(1,2) (model_training_3class.py:144), so the axis mapping is
    # load-bearing for distributional parity
    return jnp.where(do, separable_gaussian_blur(img, sx, sy), img)


def random_histogram_shift(key, img, prob, num_control_points):
    """Monotone piecewise-linear intensity warp (RandHistogramShiftd).

    Reference control points are linspace(min, max, N); floating points keep
    the endpoints and jitter interior points monotonically, like MONAI.
    """
    k_do, k_pts = jax.random.split(key)
    do = jax.random.uniform(k_do) < prob
    lo, hi = jnp.min(img), jnp.max(img)
    n = num_control_points
    ref = jnp.linspace(0.0, 1.0, n)
    # interior floating points: sorted uniforms between the endpoints
    u = jax.random.uniform(k_pts, (n - 2,)) if n > 2 else jnp.zeros((0,))
    interior = jnp.sort(u)
    float_pts = jnp.concatenate([jnp.zeros((1,)), interior, jnp.ones((1,))])
    rng_ = jnp.maximum(hi - lo, 1e-7)
    norm = (img - lo) / rng_
    # piecewise-linear eval as a static where-chain over the n-1 segments
    # (ref is a STATIC linspace): jnp.interp lowers to a searchsorted +
    # gather, and TPU gathers at image scale cost ~100 ms per train batch
    # — measured 101 -> ~0 ms for this transform; n is 3 in the reference
    # chain (model_training_3class.py:141)
    seg_w = 1.0 / (n - 1)
    warped = jnp.full_like(norm, float_pts[0])
    for j in range(n - 1):
        t = (norm - ref[j]) / seg_w
        seg = float_pts[j] + t * (float_pts[j + 1] - float_pts[j])
        warped = jnp.where(norm >= ref[j], seg, warped)
    warped = jnp.where(norm >= 1.0, float_pts[-1], warped)
    warped = warped * rng_ + lo
    return jnp.where(do, warped, img)


def _resample_bilinear(img: jax.Array, zoom: jax.Array) -> jax.Array:
    """Zoom about the center with bilinear sampling, keep_size semantics.

    zoom > 1 magnifies (center crop of the zoomed image); zoom < 1 shrinks
    (out-of-bounds reads clamp to the border, then the valid region matches
    MONAI's keep_size pad-back)."""
    h, w = img.shape[0], img.shape[1]
    yy = (jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2) / zoom + (h - 1) / 2
    xx = (jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2) / zoom + (w - 1) / 2
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(yy - y0.astype(jnp.float32), 0.0, 1.0)[:, None, None]
    wx = jnp.clip(xx - x0.astype(jnp.float32), 0.0, 1.0)[None, :, None]
    g = lambda ys, xs: img[ys][:, xs]
    out = (
        g(y0, x0) * (1 - wy) * (1 - wx)
        + g(y0, x1) * (1 - wy) * wx
        + g(y1, x0) * wy * (1 - wx)
        + g(y1, x1) * wy * wx
    )
    return out


def _resample_nearest(lbl: jax.Array, zoom: jax.Array) -> jax.Array:
    h, w = lbl.shape[0], lbl.shape[1]
    yy = (jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2) / zoom + (h - 1) / 2
    xx = (jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2) / zoom + (w - 1) / 2
    yi = jnp.clip(jnp.round(yy).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.round(xx).astype(jnp.int32), 0, w - 1)
    return lbl[yi][:, xi]


def random_zoom(key, img, lbl, prob, zoom_range):
    """RandZoomd(keep_size): bilinear for image, nearest for label."""
    k_do, k_z = jax.random.split(key)
    do = jax.random.uniform(k_do) < prob
    zoom = jax.random.uniform(k_z, minval=zoom_range[0], maxval=zoom_range[1])
    z_img = _resample_bilinear(img, zoom)
    z_lbl = _resample_nearest(lbl, zoom)
    # zoom-out: zero outside the shrunk footprint (MONAI constant pad-back)
    h, w = img.shape[0], img.shape[1]
    cy, cx = (h - 1) / 2, (w - 1) / 2
    yy = jnp.abs(jnp.arange(h, dtype=jnp.float32) - cy)[:, None]
    xx = jnp.abs(jnp.arange(w, dtype=jnp.float32) - cx)[None, :]
    inside = (yy <= cy * zoom) & (xx <= cx * zoom)
    z_img = jnp.where(inside[..., None], z_img, 0.0)
    z_lbl = jnp.where(inside, z_lbl, 0)
    return (jnp.where(do, z_img, img), jnp.where(do, z_lbl, lbl))


@functools.partial(jax.jit, static_argnames=("config",))
def augment_sample(key: jax.Array, img: jax.Array, lbl: jax.Array,
                   config: AugmentConfig = AugmentConfig()):
    """Full augmentation chain for one (H, W, 3) uint8 image + (H, W) label.

    Returns float32 image in [0,1]-ish (post intensity transforms) and the
    integer label, both ready for the train step.
    """
    keys = jax.random.split(key, 8)
    img = scale_intensity(img.astype(jnp.float32))
    lbl = lbl.astype(jnp.int32)
    img, lbl = random_axis_flip(keys[0], img, lbl, config.prob_flip)
    img, lbl = random_rot90(keys[1], img, lbl, config.prob_rot90)
    img = random_gaussian_noise(keys[2], img, config.prob_noise, config.noise_std)
    img = random_gamma_contrast(keys[3], img, config.prob_contrast, config.gamma_range)
    img = random_gaussian_smooth(
        keys[4], img, config.prob_smooth, config.sigma_x_range, config.sigma_y_range
    )
    img = random_histogram_shift(
        keys[5], img, config.prob_hist_shift, config.num_control_points
    )
    img, lbl = random_zoom(keys[6], img, lbl, config.prob_zoom, config.zoom_range)
    return img, lbl


@functools.partial(jax.jit, static_argnames=("config",))
def augment_batch(key: jax.Array, imgs: jax.Array, lbls: jax.Array,
                  config: AugmentConfig = AugmentConfig()):
    """vmapped augmentation over a (B, H, W, 3) uint8 batch."""
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(lambda k, i, l: augment_sample(k, i, l, config))(
        keys, imgs, lbls
    )
