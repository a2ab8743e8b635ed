"""Jitted training/eval steps with data-parallel sharding.

The reference's train step is the classic torch loop (model fwd, DiceCE,
AdamW, per-step .item() sync — a throughput bug noted in SURVEY.md §3.2).
Here one jitted step fuses on-device augmentation, forward, loss, backward,
and the optimizer update; with a sharded batch and replicated params, XLA
inserts the gradient all-reduce over the ICI mesh automatically. Loss is
returned as a device scalar — the host never blocks per step.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..pipeline.augment import AugmentConfig, augment_sample
from .losses import dice_ce_loss, dual_distance_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def _train_step_body(state: TrainState, imgs, lbls, rng, num_classes,
                     augment):
    """One aug+fwd+bwd+update step (shared by the per-step and fused
    dispatchers — MUST stay a single traced body so both compile to the
    same op sequence and produce bit-identical updates)."""
    if augment is not None:
        keys = jax.random.split(rng, imgs.shape[0])
        imgs, lbls = jax.vmap(
            lambda k, i, l: augment_sample(k, i, l, augment)
        )(keys, imgs, lbls)
    else:
        imgs = imgs.astype(jnp.float32) / 255.0
        lbls = lbls.astype(jnp.int32)

    def loss_fn(params):
        logits = state.apply_fn(params, imgs, train=True)
        return dice_ce_loss(logits, lbls, num_classes)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads), loss


def make_train_step(num_classes: int = 3,
                    augment: AugmentConfig | None = AugmentConfig(),
                    donate: bool = True):
    """Build the jitted 3-class train step.

    Batch: raw uint8 crops (B, H, W, 3) + int labels (B, H, W). On-device
    augmentation (when enabled) runs inside the same XLA program as the
    fwd/bwd pass.
    """

    def step(state: TrainState, imgs, lbls, rng):
        return _train_step_body(state, imgs, lbls, rng, num_classes,
                                augment)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_fused_train_step(num_classes: int = 3,
                          augment: AugmentConfig | None = AugmentConfig()):
    """Build a K-step fused dispatcher: ONE jitted lax.scan runs K train
    steps back-to-back on device.

    The per-step dispatch loop pays one host→device dispatch round-trip
    per step (measured ~110 ms/step on the tunneled dev chip for ~1 ms of
    device compute — bench.py `--pipeline train`); fusing K steps into one
    dispatch amortizes that K×. The scan body is the SAME traced step as
    `make_train_step`, fed the SAME host-split rng keys in the same order,
    so the fused path is numerically equivalent to K sequential dispatches
    (bit-level drift is limited to float reassociation between the
    scan-compiled and standalone-compiled step programs).

    Inputs: stacked batches imgs (K, B, H, W, C) uint8, lbls (K, B, H, W),
    rngs (K,) stacked PRNG keys. Returns (state, losses[K]).
    """

    def fused(state: TrainState, imgs_k, lbls_k, rngs_k):
        def body(s, batch):
            im, lb, r = batch
            s2, loss = _train_step_body(s, im, lb, r, num_classes, augment)
            return s2, loss

        return jax.lax.scan(body, state, (imgs_k, lbls_k, rngs_k))

    return jax.jit(fused, donate_argnums=(0,))


def make_distance_train_step(loss_kind: str = "smooth_l1",
                             donate: bool = True):
    """KIT-GE-style dual-head regression step: inputs are float images and
    (border, cell) distance targets."""

    def step(state: TrainState, imgs, border_gt, cell_gt):
        def loss_fn(params):
            border, cell = state.apply_fn(params, imgs, train=True)
            return dual_distance_loss(
                border, cell, border_gt, cell_gt, kind=loss_kind
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


@functools.partial(jax.jit, static_argnames=("apply_fn", "num_classes"))
def eval_dice_step(apply_fn, params, imgs, lbls, num_classes: int = 3):
    """Foreground mean Dice on thresholded softmax (MONAI DiceMetric
    include_background=False semantics; reference
    model_training_3class.py:190-196,294-304)."""
    logits = apply_fn(params, imgs)
    probs = jax.nn.softmax(logits, axis=-1)
    pred = probs > 0.5
    onehot = jax.nn.one_hot(lbls, num_classes, dtype=jnp.float32)
    axes = tuple(range(1, lbls.ndim + 1))  # spatial dims of (B,H,W,C) sans C
    inter = jnp.sum(pred * onehot, axis=(1, 2))
    denom = jnp.sum(pred, axis=(1, 2)) + jnp.sum(onehot, axis=(1, 2))
    dice = jnp.where(denom > 0, 2 * inter / denom, jnp.nan)
    return jnp.nanmean(dice[:, 1:])  # exclude background channel
