"""Pallas TPU kernels: segmented min-scans resident in VMEM.

The connected-components propagation body (ops/cc.py:_cheap_body) is
dominated by the row/column segmented min-scans: the XLA lowering
materializes every log-doubling step (⌈log2 size⌉ steps × 4 arrays ×
both directions) in HBM, ~40 full-image passes per iteration (~1 ms at
4.2 MP on v5e). Rows (resp. columns) are independent, so a whole scan
fits in VMEM: these kernels read the label/mask images once, run all
doubling steps on-chip, and write the scanned labels once — 3 HBM passes
instead of ~20 per axis.

Semantics are exactly ops/cc.py:_segmented_min_scan (same Hillis–Steele
recurrence, same fills); parity is pinned by tests/test_pallas_scans.py
in interpret mode and by the CC fuzz goldens on device.

Shape gates (VMEM budgets, see _row_stripe/_col_supported): the row
kernel stripes rows adaptively; the column kernel needs whole columns
on-chip and is gated at H ≤ 3072. Callers fall back to the XLA scan
outside the gates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF_I = 2**31 - 1


def _doubling_steps(size: int):
    d, out = 1, []
    while d < size:
        out.append(d)
        d *= 2
    return out


def _segscan_vmem(lab, mask, axis: int, size: int, region: bool = False):
    """Full segmented min-scan along `axis` on VMEM-resident blocks.

    lab: int32 with _INF outside mask; mask: int32 0/1. Identical math to
    ops/cc.py:_segmented_min_scan with the shifts done as static pads
    (Pallas TPU has no dynamic_slice on VMEM values).

    region=True switches to REGION semantics (ops/cc.py:_region_min_scan):
    segments are maximal runs of EQUAL mask value (so background runs are
    segments too, not boundaries), and every pixel receives its segment
    min. Openness is seeded from adjacent-pair equality instead of the
    mask and the result is not masked out.
    """
    h, w = lab.shape

    def shift(arr, d, fill):
        if axis == 0:
            if d > 0:
                pad = ((d, 0), (0, 0))
                sl = (slice(0, h), slice(None))
            else:
                pad = ((0, -d), (0, 0))
                sl = (slice(-d, -d + h), slice(None))
        else:
            if d > 0:
                pad = ((0, 0), (d, 0))
                sl = (slice(None), slice(0, w))
            else:
                pad = ((0, 0), (0, -d))
                sl = (slice(None), slice(-d, -d + w))
        return jnp.pad(arr, pad, constant_values=fill)[sl]

    if region:
        # open between i and i-1 iff equal mask values; -1 fill can never
        # equal a 0/1 mask entry, so edges start closed
        fo = (mask == shift(mask, 1, -1)).astype(jnp.int32)
        bo = (mask == shift(mask, -1, -1)).astype(jnp.int32)
    else:
        fo = bo = mask
    fv, bv = lab, lab
    for d in _doubling_steps(size):
        fv = jnp.where(fo != 0, jnp.minimum(fv, shift(fv, d, _INF_I)), fv)
        fo = fo & shift(fo, d, 0)
        bv = jnp.where(bo != 0, jnp.minimum(bv, shift(bv, -d, _INF_I)), bv)
        bo = bo & shift(bo, -d, 0)
    out = jnp.minimum(fv, bv)
    if region:
        return out
    return jnp.where(mask != 0, out, jnp.int32(_INF_I))


def _row_kernel(lab_ref, mask_ref, out_ref, *, w: int, region: bool = False):
    out_ref[:] = _segscan_vmem(lab_ref[:], mask_ref[:], axis=1, size=w,
                               region=region)


def _col_kernel(lab_ref, mask_ref, out_ref, *, h: int, region: bool = False):
    out_ref[:] = _segscan_vmem(lab_ref[:], mask_ref[:], axis=0, size=h,
                               region=region)


def _row_stripe(h: int, w: int):
    """Row-stripe height: keep the ~8-array live set under ~8 MB."""
    budget = 1 << 20  # bytes per live array
    stripe = max(8, min(256, budget // (4 * w) // 8 * 8))
    while h % stripe:
        stripe -= 8
        if stripe < 8:
            return None
    return stripe


def _col_supported(h: int, w: int):
    return h <= 3072 and h % 8 == 0 and w % 128 == 0


def scans_supported(h: int, w: int) -> bool:
    """Both kernels applicable (callers fall back to XLA otherwise)."""
    from .gate import pallas_allowed

    if not pallas_allowed():
        return False
    return (w % 128 == 0 and h % 8 == 0 and _row_stripe(h, w) is not None
            and _col_supported(h, w))


@functools.partial(jax.jit, static_argnames=("interpret", "region"))
def row_segmented_min_scan(lab: jax.Array, mask: jax.Array,
                           interpret: bool = False,
                           region: bool = False) -> jax.Array:
    """Segmented min-scan along rows (axis=1), whole rows in VMEM."""
    h, w = lab.shape
    stripe = _row_stripe(h, w)
    kernel = functools.partial(_row_kernel, w=w, region=region)
    return pl.pallas_call(
        kernel,
        grid=(h // stripe,),
        in_specs=[
            pl.BlockSpec((stripe, w), lambda i: (i, 0)),
            pl.BlockSpec((stripe, w), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((stripe, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=interpret,
    )(lab, mask.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("interpret", "region"))
def col_segmented_min_scan(lab: jax.Array, mask: jax.Array,
                           interpret: bool = False,
                           region: bool = False) -> jax.Array:
    """Segmented min-scan along columns (axis=0), whole columns in VMEM."""
    h, w = lab.shape
    cstripe = 128
    kernel = functools.partial(_col_kernel, h=h, region=region)
    return pl.pallas_call(
        kernel,
        grid=(w // cstripe,),
        in_specs=[
            pl.BlockSpec((h, cstripe), lambda i: (0, i)),
            pl.BlockSpec((h, cstripe), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((h, cstripe), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=interpret,
    )(lab, mask.astype(jnp.int32))
