"""Shared conv building blocks for the model zoo (flax.linen, NHWC).

Capability-equivalents of the reference's conv/residual units
(MONAI UNet residual units at baseline/model_training_3class.py:200-208 and
KIT-GE ConvBlock/TranspConvBlock at segmentation/utils/unets.py:70-242),
designed TPU-first: NHWC layout, bfloat16 compute with float32 params and
float32 normalization statistics, so convs tile straight onto the MXU.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def make_norm(kind: str, dtype: Dtype = jnp.float32) -> Callable[..., nn.Module]:
    """Normalization factory: instance / group / batch-free layer variants.

    Normalization always computes in float32 regardless of activation dtype.
    """
    kind = kind.lower()
    if kind == "instance":
        # one group per channel == instance norm
        return lambda feats: nn.GroupNorm(num_groups=feats, dtype=jnp.float32)
    if kind == "group":
        return lambda feats: nn.GroupNorm(
            num_groups=min(8, feats), dtype=jnp.float32
        )
    if kind == "layer":
        return lambda feats: nn.LayerNorm(dtype=jnp.float32)
    if kind == "none":
        return lambda feats: (lambda x: x)
    raise ValueError(f"unknown norm kind: {kind}")


def make_act(kind: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    kind = kind.lower()
    table = {
        "relu": nn.relu,
        "leakyrelu": lambda x: nn.leaky_relu(x, 0.01),
        "elu": nn.elu,
        "gelu": nn.gelu,
        "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
        "prelu": None,  # handled as a module (has a learned parameter)
    }
    if kind not in table:
        raise ValueError(f"unknown activation kind: {kind}")
    return table[kind]


class Activation(nn.Module):
    """Activation wrapper so PReLU's learned slope lives in the param tree."""

    kind: str = "prelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.kind.lower() == "prelu":
            alpha = self.param("alpha", nn.initializers.constant(0.25), ())
        else:
            return make_act(self.kind)(x)
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class ConvNormAct(nn.Module):
    """conv → norm → activation, the universal stem."""

    features: int
    kernel: int = 3
    strides: int = 1
    norm: str = "instance"
    act: str = "prelu"
    dtype: Dtype = jnp.float32
    use_norm: bool = True
    use_act: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding="SAME",
            dtype=self.dtype,
        )(x)
        if self.use_norm:
            x = make_norm(self.norm)(self.features)(x).astype(self.dtype)
        if self.use_act:
            x = Activation(kind=self.act, dtype=self.dtype)(x)
        return x


class ResidualUnit(nn.Module):
    """Strided residual unit: N conv-norm-act subunits + projection shortcut.

    Capability parity with MONAI's ResidualUnit (used by the reference UNet,
    baseline/model_training_3class.py:200-208: num_res_units=2).
    """

    features: int
    strides: int = 1
    subunits: int = 2
    kernel: int = 3
    norm: str = "instance"
    act: str = "prelu"
    dtype: Dtype = jnp.float32
    last_act: bool = True

    @nn.compact
    def __call__(self, x):
        residual = x
        y = x
        for i in range(self.subunits):
            is_last = i == self.subunits - 1
            y = ConvNormAct(
                features=self.features,
                kernel=self.kernel,
                strides=self.strides if i == 0 else 1,
                norm=self.norm,
                act=self.act,
                dtype=self.dtype,
                use_act=(not is_last) or self.last_act,
            )(y)
        needs_proj = (
            residual.shape[-1] != self.features or self.strides != 1
        )
        if needs_proj:
            residual = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.strides, self.strides),
                padding="SAME",
                dtype=self.dtype,
            )(residual)
        return y + residual
