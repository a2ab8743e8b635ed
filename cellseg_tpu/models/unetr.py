"""UNETR2D: ViT encoder + convolutional UNet decoder (flax, NHWC).

Capability parity with the reference's custom UNETR2D
(baseline/models/unetr2d.py:17-178): ViT-768/12L/12H with 16×16 patches,
skip taps at transformer depths 3/6/9, progressive-upsample CNN encoders on
the taps, and a 4-stage deconv+concat decoder to `out_channels` logits.
Rebuilt TPU-first with NHWC tensors and MXU-shaped attention.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ResidualUnit
from .vit import ViT

Dtype = Any


class DeconvBlock(nn.Module):
    """transposed conv ×2 upsample + norm + act."""

    features: int
    norm: str = "instance"
    act: str = "prelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                             padding="SAME", dtype=self.dtype)(x)
        return x


class PrUpBlock(nn.Module):
    """Progressive upsampling stack: num_layer× (deconv + conv block).

    Mirrors UnetrPrUpBlock (reference unetr2d.py:70-114)."""

    features: int
    num_layer: int
    norm: str = "instance"
    act: str = "prelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = DeconvBlock(self.features, dtype=self.dtype)(x)
        for _ in range(self.num_layer):
            x = DeconvBlock(self.features, dtype=self.dtype)(x)
            x = ResidualUnit(self.features, subunits=2, norm=self.norm,
                             act=self.act, dtype=self.dtype)(x)
        return x


class UpCatBlock(nn.Module):
    """Deconv upsample, concat skip, residual conv (UnetrUpBlock)."""

    features: int
    norm: str = "instance"
    act: str = "prelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        x = DeconvBlock(self.features, dtype=self.dtype)(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return ResidualUnit(self.features, subunits=2, norm=self.norm,
                            act=self.act, dtype=self.dtype)(x)


class UNETR2D(nn.Module):
    out_channels: int = 3
    img_size: int = 256
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    patch_size: int = 16
    norm: str = "instance"
    act: str = "prelu"
    dtype: Dtype = jnp.float32
    # debug=True returns (logits, intermediates dict) with every encoder
    # tap and decoder stage (reference unetr2d.py:175-178)
    debug: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        fs = self.feature_size
        # skip taps at quarter depths (3/6/9/12 for the reference's 12
        # layers, unetr2d.py:161-167), scaled for other depths
        n = self.num_layers
        tap_ids = (max(n // 4, 1), max(n // 2, 2), max(3 * n // 4, 3), n)
        taps, (gh, gw) = ViT(
            hidden_size=self.hidden_size, mlp_dim=self.mlp_dim,
            num_layers=n, num_heads=self.num_heads,
            patch_size=self.patch_size, taps=tap_ids,
            dtype=self.dtype, name="vit",
        )(x)

        def grid(t):
            b = t.shape[0]
            return t.reshape(b, gh, gw, self.hidden_size)

        # enc1: full-res conv stem on the raw image
        enc1 = ResidualUnit(fs, subunits=2, norm=self.norm, act=self.act,
                            dtype=self.dtype)(x)
        # progressive upsampling encoders from the transformer taps
        enc2 = PrUpBlock(fs * 2, num_layer=2, norm=self.norm, act=self.act,
                         dtype=self.dtype)(grid(taps[tap_ids[0]]))  # H/2
        enc3 = PrUpBlock(fs * 4, num_layer=1, norm=self.norm, act=self.act,
                         dtype=self.dtype)(grid(taps[tap_ids[1]]))  # H/4
        enc4 = PrUpBlock(fs * 8, num_layer=0, norm=self.norm, act=self.act,
                         dtype=self.dtype)(grid(taps[tap_ids[2]]))  # H/8
        bottleneck = grid(taps[n])                                  # H/16

        d4 = UpCatBlock(fs * 8, norm=self.norm, act=self.act,
                        dtype=self.dtype)(bottleneck, enc4)    # H/8
        d3 = UpCatBlock(fs * 4, norm=self.norm, act=self.act,
                        dtype=self.dtype)(d4, enc3)            # H/4
        d2 = UpCatBlock(fs * 2, norm=self.norm, act=self.act,
                        dtype=self.dtype)(d3, enc2)            # H/2
        d1 = UpCatBlock(fs, norm=self.norm, act=self.act,
                        dtype=self.dtype)(d2, enc1)            # H
        out = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(d1)
        out = out.astype(jnp.float32)
        if self.debug:
            return out, {"x1": enc1, "x2": enc2, "x3": enc3, "x4": enc4,
                         "bottleneck": bottleneck, "dec4": d4, "dec3": d3,
                         "dec2": d2, "dec1": d1}
        return out
