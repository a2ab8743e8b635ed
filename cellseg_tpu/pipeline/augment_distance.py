"""On-device augmentation for the distance-regression pipeline.

Distributional parity with KIT-GE's augmentors
(segmentation/training/mytransforms.py:13-42): 8-way flip/rot90 (p=1.0),
contrast (p=0.5), scaling 0.8–1.2 (p=0.25), rotation ±45° (p=0.25), blur
σ∈[1,2.75] (p=0.3), additive Gaussian noise 1–6% (p=0.3). Geometric
transforms apply to the image and both distance targets (bilinear — the
targets are continuous); intensity transforms apply to the image only.

Images arrive in [-1, 1] (KIT-GE ToTensor convention).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .augment import separable_gaussian_blur


class DistanceAugmentConfig(NamedTuple):
    prob_flip: float = 1.0
    prob_contrast: float = 0.5
    prob_scale: float = 0.25
    scale_range: tuple = (0.8, 1.2)
    prob_rotate: float = 0.25
    max_angle_deg: float = 45.0
    prob_blur: float = 0.3
    blur_sigma: tuple = (1.0, 2.75)
    prob_noise: float = 0.3
    noise_frac: tuple = (0.01, 0.06)


def _affine_sample(img: jax.Array, angle: jax.Array, scale: jax.Array,
                   order1: bool = True) -> jax.Array:
    """Rotate+scale about the center with bilinear sampling, zero fill.

    img: (H, W, C)."""
    h, w = img.shape[0], img.shape[1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # inverse map: output → input coords
    sy = (cos * yy - sin * xx) / scale + cy
    sx = (sin * yy + cos * xx) / scale + cx
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    valid = ((sy >= 0) & (sy <= h - 1) & (sx >= 0) & (sx <= w - 1))[..., None]
    y0c = jnp.clip(y0, 0, h - 1)
    x0c = jnp.clip(x0, 0, w - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    x1c = jnp.clip(x0 + 1, 0, w - 1)
    g = lambda ys, xs: img[ys, xs]
    out = (g(y0c, x0c) * (1 - wy) * (1 - wx) + g(y0c, x1c) * (1 - wy) * wx +
           g(y1c, x0c) * wy * (1 - wx) + g(y1c, x1c) * wy * wx)
    return jnp.where(valid, out, 0.0)


@functools.partial(jax.jit, static_argnames=("config",))
def augment_distance_sample(key: jax.Array, img: jax.Array,
                            border_gt: jax.Array, cell_gt: jax.Array,
                            config: DistanceAugmentConfig = DistanceAugmentConfig()):
    """img (H, W, 1) in [-1,1]; targets (H, W, 1) in [0,1]."""
    keys = jax.random.split(key, 10)
    stack = jnp.concatenate([img, border_gt, cell_gt], axis=-1)

    # 8-way flip/rot90 family (Flip, mytransforms.py:184-285; p=1.0)
    variant = jax.random.randint(keys[0], (), 0, 8)
    k_rot = variant % 4
    do_flip = variant >= 4
    rots = [lambda x, v=v: jnp.rot90(x, v, axes=(0, 1)) for v in range(4)]
    stack = jax.lax.switch(k_rot, rots, stack)
    stack = jnp.where(do_flip, stack[:, ::-1, :], stack)

    # rotation ±45° + scaling 0.8–1.2 (both geometric, combined sampler)
    do_rot = jax.random.uniform(keys[1]) < config.prob_rotate
    angle = jnp.where(
        do_rot,
        jax.random.uniform(keys[2], minval=-1.0, maxval=1.0)
        * config.max_angle_deg * jnp.pi / 180.0,
        0.0,
    )
    do_scale = jax.random.uniform(keys[3]) < config.prob_scale
    scale = jnp.where(
        do_scale,
        jax.random.uniform(keys[4], minval=config.scale_range[0],
                           maxval=config.scale_range[1]),
        1.0,
    )
    needs_affine = jnp.logical_or(do_rot, do_scale)
    affined = _affine_sample(stack, angle, scale)
    stack = jnp.where(needs_affine, affined, stack)

    img_a = stack[..., :1]
    border_a = jnp.clip(stack[..., 1:2], 0.0, 1.0)
    cell_a = jnp.clip(stack[..., 2:3], 0.0, 1.0)

    # contrast (p=0.5): the reference's Contrast op picks one of CLAHE /
    # min-max percentile stretch / contrast+gamma (mytransforms.py:72-133).
    # On device we branch 50/50 between the two global variants (CLAHE's
    # local-tile equalization has no cheap XLA form; the stretch covers
    # its train-time role of contrast decoupling): (a) gamma stretch
    # around the [-1,1] midpoint, (b) random-percentile min-max restretch
    # — the branch that makes the net robust to how much of the intensity
    # range the cells occupy (real multi-modality corpora vary wildly;
    # see the anchor diagnosis in BASELINE.md).
    do_c = jax.random.uniform(keys[5]) < config.prob_contrast
    pick_stretch = jax.random.uniform(jax.random.fold_in(key, 103)) < 0.5
    gamma = jax.random.uniform(keys[6], minval=0.65, maxval=1.35)
    x01 = jnp.clip((img_a + 1.0) / 2.0, 0.0, 1.0)
    gammaed = (x01 ** gamma) * 2.0 - 1.0
    # the reference stretches between the (0.2, 99.8) percentiles
    # (mytransforms.py:104-105) — an outlier-robust near-min-max. More
    # aggressive percentiles were measured to DESTROY sparse images
    # (92nd percentile of a mostly-background crop is background level,
    # clipping every cell pixel to 1.0): anchor train OP_CSB fell
    # 0.43 → 0.10 with (0-8, 92-100) randomized bounds.
    lo = jnp.percentile(x01, 0.2)
    hi = jnp.percentile(x01, 99.8)
    stretched = jnp.clip((x01 - lo) / jnp.maximum(hi - lo, 1e-6),
                         0.0, 1.0) * 2.0 - 1.0
    contrasted = jnp.where(pick_stretch, stretched, gammaed)
    img_a = jnp.where(do_c, contrasted, img_a)

    # blur (p=0.3)
    do_b = jax.random.uniform(keys[7]) < config.prob_blur
    sigma = jax.random.uniform(keys[8], minval=config.blur_sigma[0],
                               maxval=config.blur_sigma[1])
    blurred = separable_gaussian_blur(img_a, sigma, sigma, radius=8)
    img_a = jnp.where(do_b, blurred, img_a)

    # additive noise (p=0.3), σ = frac × full range (2.0 for [-1,1])
    do_n = jax.random.uniform(keys[9]) < config.prob_noise
    k_extra = jax.random.fold_in(key, 101)
    frac = jax.random.uniform(
        jax.random.fold_in(key, 102),
        minval=config.noise_frac[0], maxval=config.noise_frac[1])
    noise = jax.random.normal(k_extra, img_a.shape) * frac * 2.0
    img_a = jnp.where(do_n, img_a + noise, img_a)

    return img_a, border_a, cell_a


@functools.partial(jax.jit, static_argnames=("config",))
def augment_distance_batch(key, imgs, borders, cells,
                           config: DistanceAugmentConfig = DistanceAugmentConfig()):
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(
        lambda k, i, b, c: augment_distance_sample(k, i, b, c, config)
    )(keys, imgs, borders, cells)
