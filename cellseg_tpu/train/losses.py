"""Training losses.

DiceCE matches MONAI's DiceCELoss(softmax=True) semantics used by the
reference (baseline/model_training_3class.py:234): soft Dice over softmax
probabilities (background included, smooth 1e-5 on both sides, mean over
classes and batch) plus softmax cross-entropy against the one-hot labels,
summed with unit weights.

The dual-head regression losses mirror KIT-GE's `loss_border + loss_cell`
(segmentation/training/training.py:200-202, losses.py:4-24).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def softmax_cross_entropy(logits: jax.Array, onehot: jax.Array) -> jax.Array:
    """Mean softmax CE over all pixels; targets are class probabilities."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def soft_dice(logits: jax.Array, onehot: jax.Array,
              smooth_nr: float = 1e-5, smooth_dr: float = 1e-5) -> jax.Array:
    """Soft Dice loss over softmax probs, mean over (batch, class).

    Reduction axes are the spatial dims, matching MONAI's per-(b,c) Dice.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    axes = tuple(range(1, logits.ndim - 1))  # spatial
    intersection = jnp.sum(probs * onehot, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(onehot, axis=axes)
    dice = (2.0 * intersection + smooth_nr) / (denom + smooth_dr)
    return jnp.mean(1.0 - dice)


def dice_ce_loss(logits: jax.Array, labels: jax.Array,
                 num_classes: int = 3) -> jax.Array:
    """DiceCE on integer labels (B, H, W) vs logits (B, H, W, C)."""
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    return soft_dice(logits, onehot) + softmax_cross_entropy(logits, onehot)


def smooth_l1(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    """Huber/SmoothL1, mean reduction (torch.nn.SmoothL1Loss parity)."""
    diff = jnp.abs(pred - target)
    return jnp.mean(jnp.where(diff < beta,
                              0.5 * diff * diff / beta,
                              diff - 0.5 * beta))


def dual_distance_loss(border_pred: jax.Array, cell_pred: jax.Array,
                       border_gt: jax.Array, cell_gt: jax.Array,
                       kind: str = "smooth_l1") -> jax.Array:
    """KIT-GE dual-decoder loss: loss(border) + loss(cell)."""
    fns = {
        "smooth_l1": smooth_l1,
        "l1": lambda p, t: jnp.mean(jnp.abs(p - t)),
        "mse": lambda p, t: jnp.mean((p - t) ** 2),
    }
    fn = fns[kind]
    return fn(border_pred, border_gt) + fn(cell_pred, cell_gt)


def flow_loss(flow_pred: jax.Array, cellprob_logit: jax.Array,
              flow_gt: jax.Array, cell_mask: jax.Array) -> jax.Array:
    """Cellpose-style objective: MSE on flows (×5 as in cellpose) + BCE on
    the cell-probability channel."""
    mse = jnp.mean((flow_pred - 5.0 * flow_gt) ** 2) * 0.5
    bce = jnp.mean(
        optax.sigmoid_binary_cross_entropy(
            cellprob_logit.squeeze(-1), cell_mask.astype(jnp.float32)
        )
    )
    return mse + bce


def omni_flow_loss(flow_pred: jax.Array, aux_pred: jax.Array,
                   flow_gt: jax.Array, dist_gt: jax.Array,
                   boundary_gt: jax.Array) -> jax.Array:
    """Omnipose-representation objective (targets from
    pipeline/flow_labels.masks_to_flows_omni): the cellpose flow MSE (×5
    scaling kept so both flow heads share decode semantics) + SmoothL1 on
    the regressed distance-to-boundary field (weighted ×0.2 — raw φ spans
    tens of px while the other terms are O(1)) + BCE on the boundary
    channel. aux_pred is the FlowNet(omni=True) 2-channel aux output
    (dist, boundary_logit)."""
    mse = jnp.mean((flow_pred - 5.0 * flow_gt) ** 2) * 0.5
    dist = smooth_l1(aux_pred[..., 0], dist_gt) * 0.2
    bce = jnp.mean(
        optax.sigmoid_binary_cross_entropy(
            aux_pred[..., 1], boundary_gt.astype(jnp.float32)
        )
    )
    return mse + dist + bce
