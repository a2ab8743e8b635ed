"""Vision-transformer backbone (flax, NHWC tokens) for UNETR.

Capability parity with the MONAI ViT used by the reference UNETR2D
(baseline/models/unetr2d.py:57-69: 12 layers, hidden 768, mlp 3072,
12 heads, 16×16 patches, perceptron position embedding). TPU-first:
attention and MLPs are einsum/matmul-shaped for the MXU, bfloat16
activations with float32 layer norms.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class MlpBlock(nn.Module):
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype)(x)
        x = nn.gelu(x)
        return nn.Dense(d, dtype=self.dtype)(x)


class TransformerBlock(nn.Module):
    num_heads: int
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype
        )(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        return x + MlpBlock(mlp_dim=self.mlp_dim, dtype=self.dtype)(y)


class ViT(nn.Module):
    """Patch-embedding ViT returning hidden states at requested depths."""

    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    patch_size: int = 16
    taps: Sequence[int] = (3, 6, 9, 12)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) -> tokens (B, H/p * W/p, hidden)
        b, h, w, _ = x.shape
        p = self.patch_size
        x = nn.Conv(self.hidden_size, (p, p), strides=(p, p),
                    dtype=self.dtype, name="patch_embed")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.hidden_size)
        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, gh * gw, self.hidden_size),
        )
        x = x + pos.astype(x.dtype)
        outs = {}
        for i in range(1, self.num_layers + 1):
            x = TransformerBlock(
                num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                dtype=self.dtype, name=f"block_{i}",
            )(x)
            if i in self.taps:
                outs[i] = x
        return outs, (gh, gw)
