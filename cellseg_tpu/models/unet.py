"""Residual U-Net family (single- and multi-decoder) in flax, NHWC.

Capability parity targets:
  - the reference 3-class UNet: channels (16,32,64,128,256), strides
    (2,2,2,2), 2 residual subunits (baseline/model_training_3class.py:200-208)
  - the KIT-GE DUNet: shared encoder + two single-channel regression decoders
    (cell distance / neighbor distance) (segmentation/utils/unets.py:358-484)

Design is TPU-first: NHWC tensors so XLA maps convs onto the MXU without
transposes, bfloat16 activations with float32 params/norms, and a channel
progression wide enough to keep the systolic array fed at 256×256 tiles.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Activation, ResidualUnit, make_norm

Dtype = Any


def _strides_for(channels: Sequence[int],
                 strides: Sequence[int] | None) -> Sequence[int]:
    """One downsample per encoder level; an explicit strides tuple must
    match the ladder depth (a shorter one would silently desynchronize
    encoder and decoder resolutions — deep reference --filters ladders
    like 32→1024 have more than the default 4 levels)."""
    n = len(channels) - 1
    if strides is None:
        return (2,) * n
    if len(strides) != n:
        raise ValueError(
            f"strides {tuple(strides)} must have {n} entries for "
            f"channels {tuple(channels)}")
    return strides


class UNetEncoder(nn.Module):
    channels: Sequence[int] = (16, 32, 64, 128, 256)
    strides: Sequence[int] | None = None
    num_res_units: int = 2
    norm: str = "instance"
    act: str = "prelu"
    # "conv": strided convolutions downsample (reference pool_method
    # 'conv'); "max": max-pool then stride-1 convs (pool_method 'max',
    # unets.py:154-204). Same parameter shapes either way (the residual
    # 1x1 projection is stride-independent), so checkpoints transfer.
    pool: str = "conv"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        strides = _strides_for(self.channels, self.strides)
        skips = []
        for i, feats in enumerate(self.channels[:-1]):
            stride = strides[i]
            if self.pool == "max" and stride > 1:
                x = nn.max_pool(x, (stride, stride), (stride, stride))
                stride = 1
            x = ResidualUnit(
                features=feats,
                strides=stride,
                subunits=self.num_res_units,
                norm=self.norm,
                act=self.act,
                dtype=self.dtype,
            )(x)
            skips.append(x)
        x = ResidualUnit(
            features=self.channels[-1],
            strides=1,
            subunits=self.num_res_units,
            norm=self.norm,
            act=self.act,
            dtype=self.dtype,
        )(x)
        return x, skips


class UNetDecoder(nn.Module):
    """Decoder half; out_channels=N gives an N-channel head.

    Each step concatenates the same-resolution encoder skip, then a strided
    transposed conv upsamples to the next-shallower resolution (the MONAI
    UNet recursion's `up(cat(down_out, subblock_out))` shape). The top step
    emits `out_channels` logits at input resolution with no trailing
    norm/activation.
    """

    channels: Sequence[int] = (16, 32, 64, 128, 256)
    strides: Sequence[int] | None = None
    out_channels: int = 3
    num_res_units: int = 1
    norm: str = "instance"
    act: str = "prelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips):
        strides = _strides_for(self.channels, self.strides)
        n_levels = len(self.channels) - 1
        for i in reversed(range(n_levels)):
            x = jnp.concatenate([x, skips[i]], axis=-1)
            is_top = i == 0
            out_feats = self.out_channels if is_top else self.channels[i - 1]
            stride = strides[i]
            x = nn.ConvTranspose(
                out_feats, (3, 3), strides=(stride, stride), padding="SAME",
                dtype=self.dtype,
            )(x)
            if not is_top:
                x = make_norm(self.norm)(out_feats)(x).astype(self.dtype)
                x = Activation(kind=self.act, dtype=self.dtype)(x)
            if self.num_res_units > 0:
                x = ResidualUnit(
                    features=out_feats,
                    strides=1,
                    subunits=1,
                    norm=self.norm,
                    act=self.act,
                    dtype=self.dtype,
                    last_act=not is_top,
                )(x)
        return x.astype(jnp.float32)


class UNet(nn.Module):
    """Residual U-Net with a single head (the reference 3-class baseline)."""

    out_channels: int = 3
    channels: Sequence[int] = (16, 32, 64, 128, 256)
    strides: Sequence[int] | None = None
    num_res_units: int = 2
    norm: str = "instance"
    act: str = "prelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        bottom, skips = UNetEncoder(
            channels=self.channels,
            strides=self.strides,
            num_res_units=self.num_res_units,
            norm=self.norm,
            act=self.act,
            dtype=self.dtype,
        )(x)
        return UNetDecoder(
            channels=self.channels,
            strides=self.strides,
            out_channels=self.out_channels,
            num_res_units=max(1, self.num_res_units - 1),
            norm=self.norm,
            act=self.act,
            dtype=self.dtype,
        )(bottom, skips)


class DUNet(nn.Module):
    """Shared encoder + two regression decoders (KIT-GE distance pipeline).

    Head 0 predicts the neighbor/border distance map, head 1 the cell
    distance map, both single-channel (reference
    segmentation/utils/unets.py:358-484). Filters default to the KIT-GE
    64→1024 doubling ladder.
    """

    channels: Sequence[int] = (64, 128, 256, 512, 1024)
    strides: Sequence[int] | None = None
    num_res_units: int = 2
    norm: str = "group"
    act: str = "relu"
    pool: str = "conv"  # conv (strided) | max (reference pool_method)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        bottom, skips = UNetEncoder(
            channels=self.channels,
            strides=self.strides,
            num_res_units=self.num_res_units,
            norm=self.norm,
            act=self.act,
            pool=self.pool,
            dtype=self.dtype,
        )(x)
        border = UNetDecoder(
            channels=self.channels, strides=self.strides, out_channels=1,
            norm=self.norm, act=self.act, dtype=self.dtype,
            name="border_decoder",
        )(bottom, skips)
        cell = UNetDecoder(
            channels=self.channels, strides=self.strides, out_channels=1,
            norm=self.norm, act=self.act, dtype=self.dtype,
            name="cell_decoder",
        )(bottom, skips)
        return border, cell


class AutoUNet(nn.Module):
    """Encoder-decoder WITHOUT skip connections, for unsupervised
    reconstruction pretraining (KIT-GE AutoUNet,
    segmentation/utils/unets.py:487-587). The encoder scope matches
    UNetEncoder so pretrained weights transfer directly into DUNet/UNet.
    """

    channels: Sequence[int] = (64, 128, 256, 512, 1024)
    strides: Sequence[int] | None = None
    num_res_units: int = 2
    norm: str = "group"
    act: str = "relu"
    pool: str = "conv"
    out_channels: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        bottom, _ = UNetEncoder(
            channels=self.channels,
            strides=self.strides,
            num_res_units=self.num_res_units,
            norm=self.norm,
            act=self.act,
            pool=self.pool,
            dtype=self.dtype,
        )(x)
        y = bottom
        strides = _strides_for(self.channels, self.strides)
        rev = list(self.channels[:-1])[::-1]
        for i, feats in enumerate(rev):
            stride = strides[len(rev) - 1 - i]
            y = nn.ConvTranspose(
                feats, (3, 3), strides=(stride, stride), padding="SAME",
                dtype=self.dtype,
            )(y)
            y = make_norm(self.norm)(feats)(y).astype(self.dtype)
            y = Activation(kind=self.act, dtype=self.dtype)(y)
        y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(y)
        return y.astype(jnp.float32)


class FlowNet(nn.Module):
    """U-Net with a cellpose-style head: 2 flow channels + 1 cell logit.

    Capability target of the cellpose/omnipose wrappers
    (cellpose-omnipose-KIT-GE/test_cellpose_cyto2_grey.py) — the flow-field
    representation decoded by gradient tracking in decode/flow.py.

    omni=True selects the omnipose-representation head (capability target
    of test_omnipose_cyto2_grey.py:23-28): 2 flow channels + a regressed
    distance-to-boundary field + a boundary logit (4 channels total,
    targets from pipeline/flow_labels.masks_to_flows_omni). The aux output
    is then (dist, boundary_logit) instead of the 1-channel cell logit —
    the decode mask comes from dist > 0.
    """

    channels: Sequence[int] = (32, 64, 128, 256)
    strides: Sequence[int] | None = None
    num_res_units: int = 2
    norm: str = "group"
    act: str = "relu"
    omni: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        bottom, skips = UNetEncoder(
            channels=self.channels,
            strides=self.strides,
            num_res_units=self.num_res_units,
            norm=self.norm,
            act=self.act,
            dtype=self.dtype,
        )(x)
        out = UNetDecoder(
            channels=self.channels, strides=self.strides,
            out_channels=4 if self.omni else 3,
            norm=self.norm, act=self.act, dtype=self.dtype,
        )(bottom, skips)
        flow = out[..., :2]
        aux = out[..., 2:]  # (...,1) cell logit | (...,2) omni dist+boundary
        return flow, aux
