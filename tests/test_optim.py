import jax
import jax.numpy as jnp
import numpy as np
import optax

from cellseg_tpu.train.optim import (
    ReduceLROnPlateau,
    cosine_finetune_schedule,
    gradient_centralization,
    lookahead,
    ranger,
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


def test_cosine_finetune():
    s = cosine_finetune_schedule(1e-3, total_steps=100, floor_fraction=0.1)
    assert abs(float(s(0)) - 1e-3) < 1e-9
    assert float(s(100)) >= 0.99e-4
