"""Pallas TPU kernel: block-local watershed convergence.

Same two-phase playbook as the CC decode (ops/pallas/local_cc.py), applied
to the minimax-path watershed relaxation (ops/watershed.py): the flood is
iteration-bound, not bandwidth-bound (30.7 ms at 1.7% of HBM peak at
4.2 MP — BENCH_EXTRA_r04), because each global sweep moves information one
pixel while paying a full HBM round trip per while iteration. Here each
full-width row stripe iterates the 8-neighbor lexicographic relaxation to
its LOCAL fixed point entirely in VMEM — one HBM round trip buys every
in-stripe sweep — so the outer loop only pays one iteration per stripe
boundary a basin spans (plus one trailing global relax_once in the outer
body as the cross-stripe certificate, ops/watershed.py).

Convergence: every relaxation step only replaces a pixel's (cost, hops,
label) with a lexicographically SMALLER candidate, so each constituent op
is non-increasing; outer-body identity therefore forces the global
relax_once to be the identity — the exact fixed-point certificate the
plain sweep loop uses. On exact lexicographic ties ((cost, hops) collision
at a climb) the fixed point can depend on sweep order; that residue is the
measure-zero one-pixel frontier already documented in ops/watershed.py
(the sequential golden's insertion-age order differs there too), and the
behavioral tie tests (tests/test_watershed_ties.py) pin the semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .ws_sweeps import _relax_vmem


def _kernel(e_ref, m_ref, c_ref, h_ref, l_ref, oc_ref, oh_ref, ol_ref,
            *, cap: int):
    e = e_ref[:]
    mask = m_ref[:] != 0

    def body(state):
        cost, hops, label, _, it = state
        nc, nh, nl = _relax_vmem(cost, hops, label, e, mask)
        changed = jnp.any(jnp.logical_or(
            nl != label, jnp.logical_or(nh != hops, nc != cost)))
        return nc, nh, nl, changed, it + 1

    def cond(state):
        _, _, _, changed, it = state
        return jnp.logical_and(changed, it < cap)

    cost, hops, label, _, _ = jax.lax.while_loop(
        cond, body,
        (c_ref[:], h_ref[:], l_ref[:], jnp.bool_(True), jnp.int32(0)))
    oc_ref[:] = cost
    oh_ref[:] = hops
    ol_ref[:] = label


def _ws_stripe(h: int, w: int):
    """Row-stripe height: one (stripe, w) 4-byte plane ≤ ~256 KB (the
    relaxation body keeps ~12 planes live: 3 state + 3 padded + 3 new +
    e/mask), stripe | h."""
    budget = 1 << 18
    stripe = max(8, min(128, budget // (4 * w) // 8 * 8))
    while h % stripe:
        stripe -= 8
        if stripe < 8:
            return None
    return stripe


def ws_local_supported(h: int, w: int) -> bool:
    """CELLSEG_NO_WSLOCAL=1 routes callers onto the round-4 k-fold sweep
    path (same bisection escape hatch as CELLSEG_NO_PALLAS)."""
    import os

    from .gate import pallas_allowed

    if os.environ.get("CELLSEG_NO_WSLOCAL", "").strip() in ("1", "true",
                                                            "yes"):
        return False
    if not pallas_allowed():
        return False
    return w % 128 == 0 and h % 8 == 0 and _ws_stripe(h, w) is not None


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def stripe_ws_converge(e: jax.Array, mask: jax.Array, cost: jax.Array,
                       hops: jax.Array, label: jax.Array, cap: int = 256,
                       interpret: bool = False):
    """Converge the watershed relaxation to its local fixed point inside
    each full-width row stripe (all sweeps in VMEM; full (cost, hops,
    label) change check, same as the global loop's)."""
    h, w = e.shape
    stripe = _ws_stripe(h, w)
    block_idx = lambda i: (i, 0)
    kernel = functools.partial(_kernel, cap=cap)
    return pl.pallas_call(
        kernel,
        grid=(h // stripe,),
        in_specs=[pl.BlockSpec((stripe, w), block_idx)] * 5,
        out_specs=[pl.BlockSpec((stripe, w), block_idx)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ],
        interpret=interpret,
    )(e, mask.astype(jnp.int32), cost, hops, label)
