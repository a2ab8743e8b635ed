import jax
import jax.numpy as jnp
import numpy as np
import optax

from cellseg_tpu.train.optim import (
    ReduceLROnPlateau,
    adam_amsgrad,
    cosine_finetune_schedule,
    gradient_centralization,
    lookahead,
    ranger,
    set_learning_rate,
)


def test_gradient_centralization_zero_mean():
    gc = gradient_centralization()
    g = {"w": jnp.asarray(np.random.default_rng(0).normal(0, 1, (5, 7))),
         "b": jnp.ones((7,))}
    state = gc.init(g)
    out, _ = gc.update(g, state)
    # rank>1: per-output-channel mean removed
    assert np.allclose(np.asarray(out["w"]).mean(axis=0), 0, atol=1e-6)
    # rank-1 untouched
    assert np.allclose(np.asarray(out["b"]), 1.0)


def test_lookahead_sync_every_k():
    la = lookahead(k=2, alpha=0.5)
    params = {"w": jnp.zeros(())}
    state = la.init(params)
    # constant fast update of +1
    u = {"w": jnp.ones(())}
    # step 1 (no sync): update passes through
    u1, state = la.update(u, state, params)
    params = optax.apply_updates(params, u1)
    assert float(params["w"]) == 1.0
    # step 2 (sync): fast would be 2.0; slow=0 → blended = 0 + .5*(2-0) = 1.0
    u2, state = la.update(u, state, params)
    params = optax.apply_updates(params, u2)
    assert float(params["w"]) == 1.0
    assert float(state.slow["w"]) == 1.0


def test_ranger_converges():
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.normal(0, 1, (6, 4)).astype(np.float32))
    target = target - target.mean(axis=0, keepdims=True)  # GC-reachable

    def loss(p):
        return jnp.sum((p["w"] - target) ** 2)

    params = {"w": jnp.zeros((6, 4))}
    tx = ranger(learning_rate=0.05)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for _ in range(800):
        params, state, l = step(params, state)
    # GC kills gradients along the per-column-mean direction, so adaptive
    # scaling can leave a frozen mean offset (true of torch Ranger too);
    # convergence is asserted in the centered subspace GC can reach.
    diff = np.asarray(params["w"]) - np.asarray(target)
    centered = diff - diff.mean(axis=0, keepdims=True)
    assert float((centered ** 2).sum()) < 1e-3, float((centered ** 2).sum())


def test_plateau_scheduler():
    sched = ReduceLROnPlateau(factor=0.5, patience=1)
    assert sched.step(1.0) == 1.0     # first = best
    assert sched.step(0.9) == 1.0     # improved
    assert sched.step(0.95) == 1.0    # bad 1 (<= patience)
    assert sched.step(0.95) == 0.5    # bad 2 -> decay
    assert sched.step(0.5) == 0.5     # improved again


def test_plateau_shrinks_effective_step_size():
    """The round-1 bug: scaling *gradients* before Adam is cancelled by
    second-moment normalization. With the injected LR, a forced plateau must
    actually shrink the parameter update norm (reference training.py:111-124
    semantics)."""
    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.normal(0, 1, (8, 8)).astype(np.float32))}
    tx = adam_amsgrad(1e-3)
    state = tx.init(params)

    def loss(p):
        return jnp.sum(jnp.sin(p["w"]) ** 2)

    def update_norm(p, s):
        g = jax.grad(loss)(p)
        u, s = tx.update(g, s, p)
        return float(jnp.linalg.norm(u["w"])), optax.apply_updates(p, u), s

    # warm up the second-moment stats so we're at steady state
    for _ in range(20):
        _, params, state = update_norm(params, state)
    n_full, params, state = update_norm(params, state)

    state = set_learning_rate(state, 1e-3 * 0.25)  # forced plateau decay
    n_decayed, params, state = update_norm(params, state)
    assert n_decayed < n_full / 2.0, (n_full, n_decayed)
    # and the hyperparam survives round-trips through update()
    assert abs(float(state.hyperparams["learning_rate"]) - 2.5e-4) < 1e-9


def test_set_learning_rate_on_ranger():
    params = {"w": jnp.ones((4, 4))}
    tx = ranger(learning_rate=6e-3)
    state = tx.init(params)
    state = set_learning_rate(state, 6e-4)
    g = {"w": jnp.ones((4, 4))}
    u, state = tx.update(g, state, params)
    assert np.isfinite(np.asarray(u["w"])).all()
    assert abs(float(state.hyperparams["learning_rate"]) - 6e-4) < 1e-9


def test_cosine_finetune():
    s = cosine_finetune_schedule(1e-3, total_steps=100, floor_fraction=0.1)
    assert abs(float(s(0)) - 1e-3) < 1e-9
    assert float(s(100)) >= 0.99e-4
