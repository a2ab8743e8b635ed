"""Pallas TPU kernel: block-local CC convergence (two-phase labeling).

The CC propagation loop (ops/cc.py:_propagate) is sequential-iteration
bound, not bandwidth bound: each global iteration is only ~6 HBM passes of
work but pays a while_loop round trip (kernel launches + change reduction),
and typical masks need many iterations. This kernel applies the two-phase
playbook (label locally, then merge): each grid block iterates the full
(sweep + row-scan + col-scan) propagation body to its LOCAL fixed point
entirely in VMEM — one HBM read + one write buys every local iteration —
so the outer loop only resolves cross-block label chains.

This kernel handles full-width row stripes: every horizontal neighbor
pair shares a block, so identity at the outer fixed point certifies all
row relations. Vertical transport across stripe boundaries needs no
iteration — one full-height column segmented scan (the existing VMEM
kernel, ops/pallas/scans.py) jumps entire column runs in a single pass,
and its identity certifies all column relations. For 8-conn, diagonal
pairs straddling a stripe boundary are covered by one global 3×3
reduce_window sweep in the outer body (ops/cc.py). All constituent ops
are non-increasing (each pixel only ever takes a min), so outer-body
identity forces each constituent to be the identity — the exact
convergence certificate of ops/cc.py carries over unchanged, and the
fixed point (the component-min plane) is unique, so bit-parity with the
global-propagation path is automatic.

The in-kernel loop is capped (perf knob, NOT a correctness knob: an
under-converged block is finished by the next outer iteration; the outer
certificate is what proves convergence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scans import _segscan_vmem

_INF_I = 2**31 - 1


def _sweep3x3_vmem(lab, mask, connectivity: int):
    """One masked neighbor-min sweep on a VMEM block (static pads)."""
    h, w = lab.shape
    padded = jnp.pad(lab, 1, constant_values=_INF_I)
    if connectivity == 2:
        shifts = ((-1, 0), (1, 0), (0, -1), (0, 1),
                  (-1, -1), (-1, 1), (1, -1), (1, 1))
    else:
        shifts = ((-1, 0), (1, 0), (0, -1), (0, 1))
    out = lab
    for dy, dx in shifts:
        out = jnp.minimum(out, padded[1 + dy:1 + dy + h, 1 + dx:1 + dx + w])
    return jnp.where(mask, out, jnp.int32(_INF_I))


def _kernel(lab_ref, m_ref, out_ref, *, bh: int, bw: int, connectivity: int,
            region: bool, cap: int):
    m = m_ref[:]
    if not region:
        mask = m != 0

    def body(state):
        lab, _, it = state
        new = lab
        if region:
            new = _segscan_vmem(new, m, axis=1, size=bw, region=True)
            new = _segscan_vmem(new, m, axis=0, size=bh, region=True)
        else:
            if connectivity == 2:
                new = _sweep3x3_vmem(new, mask, connectivity)
            new = _segscan_vmem(new, m, axis=1, size=bw)
            new = _segscan_vmem(new, m, axis=0, size=bh)
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < cap)

    lab = jax.lax.while_loop(
        cond, body, (lab_ref[:], jnp.bool_(True), jnp.int32(0)))[0]
    out_ref[:] = lab


def _h_stripe(h: int, w: int):
    """Row-stripe height: one (stripe, w) int32 plane ≤ ~512 KB (the
    in-kernel while body keeps ~14 planes live — scans' fv/fo/bv/bo plus
    pad temporaries — so 512 KB/plane stays well under the 16 MB scoped
    VMEM stack), stripe | h."""
    budget = 1 << 19
    stripe = max(8, min(256, budget // (4 * w) // 8 * 8))
    while h % stripe:
        stripe -= 8
        if stripe < 8:
            return None
    return stripe


def local_cc_supported(h: int, w: int) -> bool:
    """Stripe kernel + the full-height column scan both applicable
    (callers fall back to the global XLA/scan path otherwise).

    Opt-in for now (CELLSEG_LOCALCC=1): the measured A/B at 4.2 MP lost
    to the global scan path (46 vs 28 ms chained — the in-kernel local
    iterations redo the same VPU-bound doubling work the global scans do,
    and the propagation is VPU-throughput-bound, not launch-bound), kept
    for mask families where propagation is genuinely iteration-bound."""
    import os

    from .gate import pallas_allowed
    from .scans import scans_supported

    if os.environ.get("CELLSEG_LOCALCC", "").strip() not in ("1", "true",
                                                             "yes"):
        return False
    if not pallas_allowed():
        return False
    return (w % 128 == 0 and h % 8 == 0 and scans_supported(h, w)
            and _h_stripe(h, w) is not None)


@functools.partial(jax.jit, static_argnames=(
    "connectivity", "region", "cap", "interpret"))
def stripe_converge(lab: jax.Array, m: jax.Array,
                    connectivity: int = 1, region: bool = False,
                    cap: int = 16, interpret: bool = False) -> jax.Array:
    """Converge the CC propagation body to its local fixed point inside
    each full-width row-stripe block.

    lab: int32 labels (_INF outside mask); m: int32 mask (0/1) or region
    values. Non-increasing and identical at every in-stripe adjacency to
    the ops/cc.py body — see module docstring for the outer convergence
    certificate.
    """
    h, w = lab.shape
    stripe = _h_stripe(h, w)
    grid = (h // stripe,)
    block = (stripe, w)
    index_map = lambda i: (i, 0)
    kernel = functools.partial(
        _kernel, bh=block[0], bw=block[1], connectivity=connectivity,
        region=region, cap=cap)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(block, index_map),
            pl.BlockSpec(block, index_map),
        ],
        out_specs=pl.BlockSpec(block, index_map),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=interpret,
    )(lab, m.astype(jnp.int32))
