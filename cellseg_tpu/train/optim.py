"""Optimizers: Ranger (RAdam + Lookahead + gradient centralization).

Capability parity with the vendored Ranger2020 the reference's KIT-GE
pipeline trains with (segmentation/training/ranger2020.py:43-208), rebuilt
as composable optax transformations:

  - gradient centralization (:31-40): subtract the per-filter mean from
    conv/dense weight gradients (ndim > 1)
  - RAdam core (:160-176): optax.radam (variance rectification)
  - Lookahead (:200-206): every k steps, pull the fast weights toward the
    slow weights by alpha and sync

Also provides the two LR schedules the reference uses around it:
ReduceLROnPlateau-style decay and cosine-annealed fine-tuning
(training.py:111-160).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def gradient_centralization() -> optax.GradientTransformation:
    """GC: g -= mean(g over all axes but the last) for rank>1 weights.

    (Parameters here are NHWC/flax-layout: the trailing axis is the output
    feature axis, so the mean runs over the other axes.)
    """

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def gc(g):
            if g.ndim > 1:
                axes = tuple(range(g.ndim - 1))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree.map(gc, updates), state

    return optax.GradientTransformation(init, update)


class LookaheadState(NamedTuple):
    slow: optax.Params
    count: jnp.ndarray


def lookahead(k: int = 6, alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead as a terminal transformation on updates.

    Tracks slow weights in state; every k fast steps the emitted update
    lands the fast weights on slow + alpha*(fast_new - slow) and syncs the
    slow copy.
    """

    def init(params):
        # materialize a true copy: aliasing the live param buffers would
        # make them donate-twice under jit(donate_argnums=...)
        return LookaheadState(slow=jax.tree.map(lambda p: jnp.array(p, copy=True), params),
                              count=jnp.zeros((), jnp.int32))

    def update(updates, state, params):
        if params is None:
            raise ValueError("lookahead requires params")
        count = state.count + 1
        sync = count % k == 0

        def blend(u, p, s):
            fast_new = p + u
            synced = s + alpha * (fast_new - s)
            return jnp.where(sync, synced - p, u)

        new_updates = jax.tree.map(blend, updates, params, state.slow)

        def new_slow(u, p, s):
            return jnp.where(sync, p + u, s)

        slow = jax.tree.map(new_slow, new_updates, params, state.slow)
        return new_updates, LookaheadState(slow=slow, count=count)

    return optax.GradientTransformation(init, update)


def _ranger_chain(learning_rate=6e-3, b1: float = 0.95, b2: float = 0.999,
                  eps: float = 1e-5, k: int = 6, alpha: float = 0.5,
                  weight_decay: float = 0.0,
                  use_gc: bool = True) -> optax.GradientTransformation:
    chain = []
    if use_gc:
        chain.append(gradient_centralization())
    chain.append(optax.scale_by_radam(b1=b1, b2=b2, eps=eps))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    chain.append(lookahead(k=k, alpha=alpha))
    return optax.chain(*chain)


def ranger(learning_rate=6e-3, **kwargs) -> optax.GradientTransformation:
    """Ranger2020-equivalent: GC → RAdam → (weight decay) → Lookahead.

    The learning rate is an injected hyperparam (readable/writable in
    opt_state via set_learning_rate) so plateau scheduling changes the true
    step size — scaling *gradients* before an Adam-family transform is a
    near no-op (second-moment normalization cancels it).
    """
    return optax.inject_hyperparams(
        _ranger_chain,
        static_args=("b1", "b2", "eps", "k", "alpha", "weight_decay",
                     "use_gc"),
    )(learning_rate=learning_rate, **kwargs)


def adam_amsgrad(learning_rate) -> optax.GradientTransformation:
    """Adam(amsgrad) with an injected learning rate (reference KIT-GE
    trainer config, training.py:111-124: Adam lr 8e-4 amsgrad +
    ReduceLROnPlateau)."""

    def make(learning_rate):
        return optax.chain(optax.scale_by_amsgrad(),
                           optax.scale_by_learning_rate(learning_rate))

    return optax.inject_hyperparams(make)(learning_rate=learning_rate)


def set_learning_rate(opt_state, lr):
    """Return opt_state with the injected learning_rate hyperparam set.

    Works on the InjectHyperparamsState produced by ranger()/adam_amsgrad().
    Pure: safe to call between donated jit steps (same pytree structure, so
    no retrace)."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


class PlateauState(NamedTuple):
    best: float
    bad_epochs: int
    scale: float


class ReduceLROnPlateau:
    """Host-side plateau tracker (torch ReduceLROnPlateau semantics).

    The reference drives torch's scheduler off the val loss
    (training.py:237-241); here callers read `.scale` each epoch and write
    base_lr * scale into the optimizer's injected hyperparam via
    set_learning_rate().
    """

    def __init__(self, factor: float = 0.25, patience: int = 8,
                 min_lr_scale: float = 6e-3, mode: str = "min"):
        self.factor = factor
        self.patience = patience
        self.min_lr_scale = min_lr_scale
        self.mode = mode
        self.best = None
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        improved = (
            self.best is None
            or (self.mode == "min" and metric < self.best)
            or (self.mode == "max" and metric > self.best)
        )
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_lr_scale)
                self.bad_epochs = 0
        return self.scale


def cosine_finetune_schedule(base_lr: float, total_steps: int,
                             floor_fraction: float = 0.09):
    """Cosine anneal from base_lr to floor (the reference's second Ranger
    run fine-tunes at 0.09×lr with cosine annealing, training.py:126-160)."""
    return optax.cosine_decay_schedule(
        init_value=base_lr, decay_steps=max(total_steps, 1),
        alpha=floor_fraction,
    )
