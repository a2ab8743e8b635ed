"""Model zoo + factory.

`build_model(name, ...)` mirrors the reference's --model_name dispatch
(baseline/model_training_3class.py:200-232, baseline/predict.py:44-78):
unet / unetr / swinunetr for the 3-class pipeline, plus dunet (KIT-GE
distance capability) and flownet (cellpose capability).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from .unet import DUNet, FlowNet, UNet, UNetDecoder, UNetEncoder

__all__ = [
    "UNet", "DUNet", "FlowNet", "UNetEncoder", "UNetDecoder",
    "build_model", "MODEL_DEFAULTS",
]

MODEL_DEFAULTS: dict[str, dict[str, Any]] = {
    "unet": dict(
        channels=(16, 32, 64, 128, 256),
        strides=(2, 2, 2, 2),
        num_res_units=2,
    ),
    "dunet": dict(
        channels=(64, 128, 256, 512, 1024),
        strides=(2, 2, 2, 2),
        num_res_units=2,
    ),
    "flownet": dict(
        channels=(32, 64, 128, 256),
        strides=(2, 2, 2),
        num_res_units=2,
    ),
}


def build_model(name: str, num_class: int = 3, input_size: int = 256,
                dtype=jnp.float32, **overrides):
    """Instantiate a model by reference-compatible name.

    A `channels` override without a matching `strides` derives one
    downsample per level (reference --filters ladders can be deeper than
    the 5-level default, e.g. 32→1024; a stale 4-entry strides tuple
    would desynchronize encoder and decoder resolutions).
    """
    name = name.lower()
    if "channels" in overrides and "strides" not in overrides:
        overrides["strides"] = (2,) * (len(overrides["channels"]) - 1)
    if name == "unet":
        cfg = {**MODEL_DEFAULTS["unet"], **overrides}
        return UNet(out_channels=num_class, dtype=dtype, **cfg)
    if name == "unetr":
        from .unetr import UNETR2D

        return UNETR2D(
            out_channels=num_class,
            img_size=input_size,
            dtype=dtype,
            **overrides,
        )
    if name == "swinunetr":
        from .swin import SwinUNETR2D

        return SwinUNETR2D(
            out_channels=num_class,
            dtype=dtype,
            **overrides,
        )
    if name == "dunet":
        cfg = {**MODEL_DEFAULTS["dunet"], **overrides}
        return DUNet(dtype=dtype, **cfg)
    if name == "flownet":
        cfg = {**MODEL_DEFAULTS["flownet"], **overrides}
        return FlowNet(dtype=dtype, **cfg)
    raise ValueError(f"unknown model name: {name}")
