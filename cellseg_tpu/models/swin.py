"""SwinUNETR-style model: windowed-attention encoder + UNet decoder.

Capability parity with the reference's MONAI SwinUNETR configuration
(baseline/model_training_3class.py:225-232: 2D, feature_size 24): a
hierarchical shifted-window transformer encoder over 4 stages with patch
merging, plus a UNETR-style deconv decoder.

TPU-first choices: window size 8 (so 256² inputs tile exactly at every
stage — no attention-mask padding, windows map to clean MXU batches),
NHWC layout throughout, bf16 activations / f32 norms, window partition as
pure reshape/transpose (free at the XLA level).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import ResidualUnit
from .unetr import UpCatBlock

Dtype = Any


def window_partition(x, ws: int):
    """(B, H, W, C) → (B*nH*nW, ws*ws, C)"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_unpartition(x, ws: int, h: int, w: int):
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


class WindowAttention(nn.Module):
    num_heads: int
    window_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (nW, T, C) with T = window_size²
        nw, t, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype)(x)
        qkv = qkv.reshape(nw, t, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # relative position bias (learned, standard Swin)
        ws = self.window_size
        num_rel = (2 * ws - 1) ** 2
        bias_table = self.param(
            "rel_pos_bias", nn.initializers.truncated_normal(0.02),
            (num_rel, self.num_heads),
        )
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                      indexing="ij"), 0).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel_idx = (rel[0] + ws - 1) * (2 * ws - 1) + (rel[1] + ws - 1)
        bias = bias_table[rel_idx.reshape(-1)].reshape(t, t, self.num_heads)
        bias = bias.transpose(2, 0, 1).astype(self.dtype)

        attn = jnp.einsum("nthd,nshd->nhts", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn / np.sqrt(head_dim)
        attn = attn + bias[None].astype(jnp.float32)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("nhts,nshd->nthd", attn.astype(self.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(nw, t, c).astype(self.dtype)
        return nn.Dense(c, dtype=self.dtype)(out)


class SwinBlock(nn.Module):
    num_heads: int
    window_size: int = 8
    shift: bool = False
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.window_size
        shift = ws // 2 if self.shift else 0
        y = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        y = window_partition(y, ws)
        y = WindowAttention(num_heads=self.num_heads, window_size=ws,
                            dtype=self.dtype)(y)
        y = window_unpartition(y, ws, h, w)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.dtype)(y)
        return x + y


class PatchMerge(nn.Module):
    """2×2 patch merging: space-to-depth + linear reduction to 2C."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        return nn.Dense(2 * c, dtype=self.dtype)(x)


class SwinUNETR2D(nn.Module):
    out_channels: int = 3
    feature_size: int = 24
    depths: tuple = (2, 2, 2, 2)
    num_heads: tuple = (3, 6, 12, 24)
    window_size: int = 8
    norm: str = "instance"
    act: str = "prelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        fs = self.feature_size

        # patch embed: 2×2 conv stride 2 → H/2, fs channels
        h0 = nn.Conv(fs, (2, 2), strides=(2, 2), dtype=self.dtype,
                     name="patch_embed")(x)
        stages = []
        y = h0
        for i, depth in enumerate(self.depths):
            for d in range(depth):
                y = SwinBlock(
                    num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    shift=(d % 2 == 1),
                    dtype=self.dtype,
                    name=f"stage{i}_block{d}",
                )(y)
            stages.append(y)  # H/2, H/4, H/8, H/16 before merge of last
            if i < len(self.depths) - 1:
                y = PatchMerge(dtype=self.dtype, name=f"merge{i}")(y)
            else:
                y = PatchMerge(dtype=self.dtype, name=f"merge{i}")(y)  # H/32
        bottleneck = y

        # conv feature extractors on skips (SwinUNETR style)
        enc0 = ResidualUnit(fs, subunits=2, norm=self.norm, act=self.act,
                            dtype=self.dtype)(x)                 # H
        enc1 = ResidualUnit(fs, subunits=2, norm=self.norm, act=self.act,
                            dtype=self.dtype)(stages[0])         # H/2
        enc2 = ResidualUnit(fs * 2, subunits=2, norm=self.norm, act=self.act,
                            dtype=self.dtype)(stages[1])         # H/4
        enc3 = ResidualUnit(fs * 4, subunits=2, norm=self.norm, act=self.act,
                            dtype=self.dtype)(stages[2])         # H/8
        enc4 = ResidualUnit(fs * 8, subunits=2, norm=self.norm, act=self.act,
                            dtype=self.dtype)(stages[3])         # H/16

        d4 = UpCatBlock(fs * 8, norm=self.norm, act=self.act,
                        dtype=self.dtype)(bottleneck, enc4)      # H/16
        d3 = UpCatBlock(fs * 4, norm=self.norm, act=self.act,
                        dtype=self.dtype)(d4, enc3)              # H/8
        d2 = UpCatBlock(fs * 2, norm=self.norm, act=self.act,
                        dtype=self.dtype)(d3, enc2)              # H/4
        d1 = UpCatBlock(fs, norm=self.norm, act=self.act,
                        dtype=self.dtype)(d2, enc1)              # H/2
        d0 = UpCatBlock(fs, norm=self.norm, act=self.act,
                        dtype=self.dtype)(d1, enc0)              # H
        out = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(d0)
        return out.astype(jnp.float32)
