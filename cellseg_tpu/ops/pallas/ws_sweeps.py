"""Pallas TPU kernel: fused k-fold watershed relaxation sweeps.

The minimax-path watershed (ops/watershed.py) is, like CC propagation,
an HBM-bandwidth-bound iterative relaxation: every sweep reads and
writes three full planes (cost f32, hops i32, label i32) plus two
read-only planes (elevation, mask). This kernel performs k sweeps per
HBM round trip by tiling the planes into row stripes DMA'd into VMEM
with k-row halos — k in-VMEM sweeps produce exactly the same
center-stripe result as k global sweeps (influence travels at most one
row per sweep, so paths of length ≤ k stay inside the extended block).

The per-sweep update is a bit-exact replica of watershed_jax's body:
candidate cost = max(neighbor cost, own elevation), accepted on the
lexicographic (cost, hops, label-id) order. Identical fixed point,
identical intermediate states.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38
_INF_HOPS = 2**31 - 1
_SHIFTS_8 = ((-1, 0), (1, 0), (0, -1), (0, 1),
             (-1, -1), (-1, 1), (1, -1), (1, 1))


def _relax_vmem(cost, hops, label, e, mask):
    """One 8-neighbor lexicographic relaxation on VMEM-resident blocks
    (replica of ops/watershed.py watershed_jax body)."""
    h, w = cost.shape
    pc = jnp.pad(cost, 1, constant_values=_BIG)
    ph = jnp.pad(hops, 1, constant_values=_INF_HOPS)
    plb = jnp.pad(label, 1, constant_values=0)
    new_cost, new_hops, new_label = cost, hops, label
    for dy, dx in _SHIFTS_8:
        # static slices — Pallas TPU has no dynamic_slice lowering
        nc = pc[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
        nh = ph[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
        nl = plb[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
        cand = jnp.maximum(nc, e)
        # steps-at-max-level hop count (reset on climb), mirroring
        # ops/watershed.py relax_once — the two bodies must stay
        # bit-identical for the k-fold parity tests
        cand_h = jnp.where(nh == _INF_HOPS, _INF_HOPS,
                           jnp.where(e > nc, 1, nh + 1))
        cost_eq = cand == new_cost
        better = jnp.logical_or(
            cand < new_cost,
            jnp.logical_and(cost_eq, jnp.logical_or(
                cand_h < new_hops,
                jnp.logical_and(cand_h == new_hops,
                                jnp.logical_and(nl > 0,
                                                nl < new_label)))),
        )
        better = jnp.logical_and(better, jnp.logical_and(mask, nl > 0))
        new_cost = jnp.where(better, cand, new_cost)
        new_hops = jnp.where(better, cand_h, new_hops)
        new_label = jnp.where(better, nl, new_label)
    return new_cost, new_hops, new_label


def _kernel(e_hbm, mask_hbm, cost_hbm, hops_hbm, label_hbm,
            oc_hbm, oh_hbm, ol_hbm,
            e_v, m_v, c_v, h_v, l_v, sems,
            *, stripe: int, k: int, h: int, w: int):
    i = pl.program_id(0)
    ext = stripe + 2 * k
    # offsets are multiples of the 8-row sublane tiling by construction
    start = pl.multiple_of(jnp.clip(i * stripe - k, 0, h - ext), 8)
    off = pl.multiple_of(i * stripe - start, 8)

    copies = [
        pltpu.make_async_copy(e_hbm.at[pl.ds(start, ext), :], e_v,
                              sems.at[0]),
        pltpu.make_async_copy(mask_hbm.at[pl.ds(start, ext), :], m_v,
                              sems.at[1]),
        pltpu.make_async_copy(cost_hbm.at[pl.ds(start, ext), :], c_v,
                              sems.at[2]),
        pltpu.make_async_copy(hops_hbm.at[pl.ds(start, ext), :], h_v,
                              sems.at[3]),
        pltpu.make_async_copy(label_hbm.at[pl.ds(start, ext), :], l_v,
                              sems.at[4]),
    ]
    # overlap the five plane loads: start all, then wait all
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    e = e_v[:]
    mask = m_v[:] != 0

    def body(_, state):
        return _relax_vmem(state[0], state[1], state[2], e, mask)

    cost, hops, label = jax.lax.fori_loop(
        0, k, body, (c_v[:], h_v[:], l_v[:]))
    c_v[:], h_v[:], l_v[:] = cost, hops, label

    out_start = pl.multiple_of(i * stripe, 8)
    outs = [
        pltpu.make_async_copy(c_v.at[pl.ds(off, stripe), :],
                              oc_hbm.at[pl.ds(out_start, stripe), :],
                              sems.at[0]),
        pltpu.make_async_copy(h_v.at[pl.ds(off, stripe), :],
                              oh_hbm.at[pl.ds(out_start, stripe), :],
                              sems.at[1]),
        pltpu.make_async_copy(l_v.at[pl.ds(off, stripe), :],
                              ol_hbm.at[pl.ds(out_start, stripe), :],
                              sems.at[2]),
    ]
    for cp in outs:
        cp.start()
    for cp in outs:
        cp.wait()


@functools.partial(jax.jit,
                   static_argnames=("k", "stripe", "interpret"))
def fused_ws_sweeps(e: jax.Array, mask: jax.Array, cost: jax.Array,
                    hops: jax.Array, label: jax.Array, k: int = 8,
                    stripe: int = 64, interpret: bool = False):
    """k fused watershed relaxation sweeps; exact equivalent of k
    iterations of watershed_jax's while-loop body. Requires
    H % stripe == 0 and stripe >= k."""
    h, w = e.shape
    if h % stripe != 0:
        raise ValueError(f"H={h} not a multiple of stripe={stripe}")
    kernel = functools.partial(_kernel, stripe=stripe, k=k, h=h, w=w)
    ext = stripe + 2 * k
    out = pl.pallas_call(
        kernel,
        grid=(h // stripe,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ext, w), jnp.float32),
            pltpu.VMEM((ext, w), jnp.int32),
            pltpu.VMEM((ext, w), jnp.float32),
            pltpu.VMEM((ext, w), jnp.int32),
            pltpu.VMEM((ext, w), jnp.int32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
        interpret=interpret,
    )(e, mask.astype(jnp.int32), cost, hops, label)
    return out[0], out[1], out[2]


def ws_sweeps_config(h: int, w: int):
    """Pick (stripe, k) for the fused watershed kernel, or None.

    VMEM budget: ~12 live (stripe+2k, w) 4-byte blocks (5 planes + padded
    copies + accumulators inside the relaxation); cap at ~14 MB.
    """
    from .gate import pallas_allowed

    if not pallas_allowed():
        return None
    if w % 128 != 0:
        return None
    # Current libtpu places the custom-call result tuple in scoped VMEM
    # inside the while body; at 2048² that is an 18.12M stack request vs
    # the 16M scoped limit (compile-time OOM on this legacy path — the
    # default route is ws_local). Gate full planes above ~8 MB so the
    # escape hatch degrades to the plain-XLA relax loop instead of
    # failing to compile (measured round 5, scripts/ws_ab.py docstring).
    if h * w * 4 > 8 * 2**20:
        return None
    budget = 14 * 2**20
    for stripe, k in ((64, 8), (32, 8)):
        if h % stripe != 0 or h < 2 * stripe or stripe < k:
            continue
        if (stripe + 2 * k) * w * 4 * 12 <= budget:
            return stripe, k
    return None
