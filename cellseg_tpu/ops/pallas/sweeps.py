"""Pallas TPU kernel: fused k-fold neighbor-min label sweeps.

The connected-components hot loop (ops/cc.py) is HBM-bandwidth-bound: each
neighbor-min sweep reads and writes the whole label image. This kernel
performs k sweeps per HBM round trip by tiling the image into row stripes
that are DMA'd into VMEM with k-row halos — k sweeps inside VMEM produce
exactly the same center-stripe result as k global sweeps (label information
travels at most k rows in k sweeps).

Layout: grid over row stripes; lab/mask live in ANY/HBM and are copied
with explicit async DMA at clamped dynamic offsets (overlapping halo reads
can't be expressed with plain BlockSpec index maps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF_I = 2**31 - 1


def _sweep_vmem(lab, mask, connectivity: int):
    """One masked neighbor-min sweep on a VMEM-resident block."""
    big = jnp.int32(_INF_I)
    padded = jnp.pad(lab, 1, constant_values=_INF_I)
    h, w = lab.shape
    out = lab
    if connectivity == 2:
        shifts = ((-1, 0), (1, 0), (0, -1), (0, 1),
                  (-1, -1), (-1, 1), (1, -1), (1, 1))
    else:
        shifts = ((-1, 0), (1, 0), (0, -1), (0, 1))
    for dy, dx in shifts:
        # static slices — Pallas TPU has no dynamic_slice lowering
        nb = padded[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
        out = jnp.minimum(out, nb)
    return jnp.where(mask, out, big)


def _kernel(lab_hbm, mask_hbm, out_hbm, lab_v, mask_v, sem_l, sem_m,
            *, stripe: int, k: int, h: int, w: int, connectivity: int):
    i = pl.program_id(0)
    ext = stripe + 2 * k
    # all offsets are multiples of the int32 sublane tiling (8) by
    # construction (stripe % 8 == 0, k % 8 == 0); Mosaic needs the hint
    start = pl.multiple_of(jnp.clip(i * stripe - k, 0, h - ext), 8)
    off = pl.multiple_of(i * stripe - start, 8)

    cp_l = pltpu.make_async_copy(
        lab_hbm.at[pl.ds(start, ext), :], lab_v, sem_l)
    cp_m = pltpu.make_async_copy(
        mask_hbm.at[pl.ds(start, ext), :], mask_v, sem_m)
    cp_l.start()
    cp_m.start()
    cp_l.wait()
    cp_m.wait()

    mask = mask_v[:] != 0
    # k sweeps entirely in VMEM; fori_loop keeps the temporary footprint at
    # one sweep (unrolling k sweeps overflows the scoped-VMEM stack)
    lab = jax.lax.fori_loop(
        0, k, lambda j, l: _sweep_vmem(l, mask, connectivity), lab_v[:])
    # stash the swept block back in VMEM, then DMA the owned stripe out
    # (HBM/ANY refs are only reachable via async_copy)
    lab_v[:] = lab
    out_start = pl.multiple_of(i * stripe, 8)
    cp_out = pltpu.make_async_copy(
        lab_v.at[pl.ds(off, stripe), :],
        out_hbm.at[pl.ds(out_start, stripe), :],
        sem_l,
    )
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit,
                   static_argnames=("k", "connectivity", "stripe"))
def fused_sweeps(lab: jax.Array, mask: jax.Array, k: int = 8,
                 connectivity: int = 2, stripe: int = 128) -> jax.Array:
    """k fused neighbor-min sweeps; exact equivalent of k calls to
    ops.cc._sweep_min. Requires H % stripe == 0 and stripe >= k."""
    h, w = lab.shape
    if h % stripe != 0:
        raise ValueError(f"H={h} not a multiple of stripe={stripe}")
    n_stripes = h // stripe
    kernel = functools.partial(
        _kernel, stripe=stripe, k=k, h=h, w=w, connectivity=connectivity)
    return pl.pallas_call(
        kernel,
        grid=(n_stripes,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((stripe + 2 * k, w), jnp.int32),
            pltpu.VMEM((stripe + 2 * k, w), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(lab, mask.astype(jnp.int32))
