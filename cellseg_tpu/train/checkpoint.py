"""Checkpointing: msgpack param/opt-state blobs + JSON architecture sidecar.

The reference saves torch state dicts plus (KIT-GE) a JSON sidecar that lets
inference rebuild the architecture from disk (segmentation/utils/utils.py:
102-115, inference.py:36-48) — that sidecar idea is kept here as the primary
mechanism: every checkpoint directory carries `config.json` with the model
name and constructor arguments, so `load_model_for_inference` needs no
out-of-band knowledge. Resume is first-class (the reference's was commented
out, model_training_3class.py:64).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
from flax import serialization


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    step: int = 0, epoch: int = 0,
                    extra: dict | None = None) -> None:
    """Serialize a training snapshot to a single msgpack file."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        # to_state_dict converts tuple-structured pytrees (e.g. optax
        # states) into msgpack-friendly nested dicts
        "params": serialization.to_state_dict(jax.device_get(params)),
        "step": int(step),
        "epoch": int(epoch),
    }
    if opt_state is not None:
        payload["opt_state"] = serialization.to_state_dict(
            jax.device_get(opt_state)
        )
    if extra:
        payload["extra"] = extra
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_params(path: str, params_template: Any) -> tuple[Any, dict]:
    """Load params shaped like `params_template`; returns (params, payload)."""
    payload = load_checkpoint(path)
    params = serialization.from_state_dict(params_template, payload["params"])
    return jax.device_put(params), payload


def save_sidecar(directory: str, config: dict) -> None:
    """Write the architecture/config JSON sidecar next to checkpoints."""
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(config, f, indent=2, default=str)


def load_sidecar(directory: str) -> dict:
    with open(os.path.join(directory, "config.json")) as f:
        return json.load(f)


def verify_checkpoint_arch(ckpt_path: str, json_path: str | None = None) -> dict:
    """Arch-check a ``.ckpt`` + JSON-sidecar pair WITHOUT touching a device.

    Rebuilds the model the sidecar declares, shapes its parameter tree via
    ``jax.eval_shape`` (no FLOPs, no device memory), and structurally
    compares it against the stored state dict: missing / unexpected
    parameters and shape mismatches are all collected into one error.
    This is the import-side validation the reference's model downloader
    implies (KIT-GE download_models.py:24-45 fetches arch-specific
    archives; here archives are user-provided, so the check is explicit).

    Returns the parsed sidecar config on success.
    """
    import jax.numpy as jnp
    import numpy as np

    from ..models import build_model

    if json_path is None:
        json_path = os.path.splitext(ckpt_path)[0] + ".json"
        if not os.path.exists(json_path):
            json_path = os.path.join(os.path.dirname(ckpt_path), "config.json")
    with open(json_path) as f:
        cfg = json.load(f)
    arch = {k: tuple(v) if isinstance(v, list) else v
            for k, v in cfg.get("architecture", {}).items()}
    model = build_model(
        cfg["model_name"],
        num_class=cfg.get("num_class", 3),
        input_size=cfg.get("input_size", 256),
        dtype=jnp.bfloat16 if cfg.get("dtype") == "bfloat16" else jnp.float32,
        **arch,
    )
    size = cfg.get("input_size", 256)
    dummy = jax.ShapeDtypeStruct((1, size, size, cfg.get("in_channels", 3)),
                                 jnp.float32)
    template = jax.eval_shape(
        lambda d: model.init(jax.random.PRNGKey(0), d), dummy)
    want = serialization.to_state_dict(template)
    got = load_checkpoint(ckpt_path).get("params")
    if got is None:
        raise ValueError(f"{ckpt_path}: no 'params' entry in checkpoint")

    problems: list[str] = []

    def walk(w, g, prefix: str) -> None:
        wk, gk = set(w), set(g)
        problems.extend(f"missing param {prefix}{k}" for k in sorted(wk - gk))
        problems.extend(f"unexpected param {prefix}{k}"
                        for k in sorted(gk - wk))
        for k in sorted(wk & gk):
            if isinstance(w[k], dict):
                if not isinstance(g[k], dict):
                    problems.append(f"{prefix}{k}: subtree vs leaf")
                else:
                    walk(w[k], g[k], f"{prefix}{k}/")
            else:
                ws, gs = tuple(w[k].shape), tuple(np.shape(g[k]))
                if ws != gs:
                    problems.append(f"{prefix}{k}: sidecar arch wants shape "
                                    f"{ws}, checkpoint has {gs}")

    walk(want, got, "")
    if problems:
        head = "; ".join(problems[:8])
        more = f" (+{len(problems) - 8} more)" if len(problems) > 8 else ""
        raise ValueError(
            f"{ckpt_path}: architecture mismatch vs {json_path}: {head}{more}")
    return cfg


def load_model_for_inference(model_dir: str, checkpoint: str = "best_model.ckpt"):
    """Rebuild (model, params) from a checkpoint directory + sidecar.

    Also accepts a bare ``.ckpt`` FILE path (e.g. the bundled
    ``assets/pretrained_flow.ckpt``), in which case the architecture
    sidecar is the sibling ``<stem>.json``."""
    import jax.numpy as jnp

    from ..models import build_model

    if os.path.isfile(model_dir):
        ckpt_path = model_dir
        with open(os.path.splitext(model_dir)[0] + ".json") as f:
            cfg = json.load(f)
    else:
        ckpt_path = os.path.join(model_dir, checkpoint)
        cfg = load_sidecar(model_dir)
    arch = {k: tuple(v) if isinstance(v, list) else v
            for k, v in cfg.get("architecture", {}).items()}
    model = build_model(
        cfg["model_name"],
        num_class=cfg.get("num_class", 3),
        input_size=cfg.get("input_size", 256),
        dtype=jnp.bfloat16 if cfg.get("dtype") == "bfloat16" else jnp.float32,
        **arch,
    )
    payload = load_checkpoint(ckpt_path)
    # initialize a template to restore against
    dummy = jnp.zeros((1, cfg.get("input_size", 256), cfg.get("input_size", 256),
                       cfg.get("in_channels", 3)), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), dummy)
    params = serialization.from_state_dict(template, payload["params"])
    # from_state_dict leaves are host numpy arrays; without an explicit
    # device_put every jitted call re-uploads the full parameter set
    # (megabytes per stage per image over a tunnel/PCIe link)
    params = jax.device_put(params)
    return model, params, cfg
