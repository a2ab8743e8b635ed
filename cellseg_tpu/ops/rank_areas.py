"""Sort-free per-component areas via dense ranks + MXU histograms.

The decode's area filters (hole fill < 64 px, object filter < 16 px,
reference chain baseline/predict.py:110-113) were sort-based: two full-
image sort passes per filter (~11 ms each at 4.2 MP on v5e). This module
replaces them with matmul-shaped primitives that ride the MXU:

1. Dense component ranks WITHOUT a gather or sort: with ``R[i] =
   cumsum(is_root)[i]`` (the prefix count of component roots), R is
   non-decreasing in the linear index, so the min of R over a component
   is attained at the component's root — i.e. ``min_{i in C} R[i] =
   R[root(C)] = rank of C``. One region min-propagation of the R plane
   therefore yields every pixel's dense component rank in [1, K].

2. Per-rank pixel counts as an exact one-hot einsum histogram
   (hi/lo-decomposed 256x256 bins, f32 MXU accumulation summed in int32
   per <=2^23-pixel group — the same exactness recipe as
   pipeline/normalize.py:_histogram_256), instead of a sort pair.

3. The per-pixel smallness decision as a bilinear one-hot lookup
   ``flag[n] = oh_hi[n] @ S @ oh_lo[n]`` (two MXU contractions), instead
   of the unsort pass.

Ranks above _RANK_BINS (65536) would alias, so callers guard with
``lax.cond(K <= _RANK_BINS, hist_path, sort_path)`` — the sort path is
the round-3 machinery and stays bit-identical.

The histogram/lookup einsums are COMPUTE-bound, not memory-bound: at
256×256 bins each one costs 2·n·65536 FLOPs (≈620 GF at 4.2 MP → a ~3 ms
MXU floor, measured ~6 ms per area filter). Most post-filter rank counts
are far below 4096, so every entry point is tiered: a 64×64-bin variant
(16× fewer FLOPs, ~0.4 ms) runs when K ≤ 4096, the 256×256 variant when
K ≤ 65536, the sort path above — all bit-identical, selected by nested
lax.cond on the runtime K.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_RANK_BINS = 65536  # raw trained-model masks carry ~31k speckle
# components at 4.2 MP (pre-filter), so 16384 bins silently routed the
# bench decode onto the sort fallback every call — 256x256 one-hot planes
# stay exact in bf16 (0/1 values; integers <= 256 for the hi/lo split)
_SIDE = 256  # _RANK_BINS == _SIDE * _SIDE
_SIDE_SMALL = 64  # 4096-bin tier: 16x fewer einsum FLOPs
_BINS_SMALL = _SIDE_SMALL * _SIDE_SMALL
_GROUP = 1 << 23  # f32 one-hot accumulation stays exact below 2^24


def _mxu_dtype():
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend
        platform = "cpu"
    # bf16 operands are exact for 0/1 one-hots and the MXU accumulates in
    # f32; on CPU f32 operands are the fast exact path
    return jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32


def dense_region_ranks(roots: jax.Array, m: jax.Array):
    """Per-pixel dense component rank from a converged region-root plane.

    roots: ops/cc.py:region_roots output (component-min linear indices for
    every pixel); m: the int32 region plane the roots were computed with.
    Returns (dense ranks in [1, K] as int32 plane, R prefix-rank plane,
    K = total number of regions, scalar int32).
    """
    from .cc import _propagate_region

    h, w = roots.shape
    lin = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    is_root = roots == lin
    r_plane = jnp.cumsum(is_root.ravel().astype(jnp.int32)).reshape(h, w)
    k_total = r_plane[-1, -1]
    dense = _propagate_region(r_plane, m)
    return dense, r_plane, k_total


def counts_by_rank(dense0: jax.Array, weight: jax.Array,
                   side: int = _SIDE) -> jax.Array:
    """Exact count of weight-true pixels per rank — (side², ) int32.

    dense0: 0-based ranks (any shape, int32, values < side² for exact
    results); weight: bool same shape. One-hot hi/lo einsum on the MXU,
    f32-accumulated per <=2^23-pixel group, int32-summed across groups.
    """
    dt = _mxu_dtype()
    d = dense0.ravel()
    wt = weight.ravel()
    n = d.shape[0]
    if n <= _GROUP:
        groups = 1  # no padding below the exactness bound
    else:
        groups = -(-n // _GROUP)
        pad = groups * _GROUP - n
        if pad:
            d = jnp.pad(d, (0, pad))
            wt = jnp.pad(wt, (0, pad))
    d = d.reshape(groups, -1)
    wt = wt.reshape(groups, -1)
    iota = jnp.arange(side, dtype=jnp.int32)
    oh_hi = ((d // side)[..., None] == iota).astype(dt)
    oh_lo = ((d % side)[..., None] == iota).astype(dt)
    oh_hi = oh_hi * wt[..., None].astype(dt)
    per_group = jnp.einsum("gnh,gnl->ghl", oh_hi, oh_lo,
                           preferred_element_type=jnp.float32)
    counts = per_group.astype(jnp.int32).sum(axis=0)
    return counts.reshape(-1)


def rank_flag_lookup(dense0: jax.Array, flags: jax.Array,
                     side: int = _SIDE) -> jax.Array:
    """Per-pixel bool flags[dense0] without a gather.

    flags: (side², ) bool table. Bilinear one-hot contraction
    ``oh_hi @ S @ oh_lo`` — both stages are exact in bf16 (0/1 values,
    one nonzero per one-hot row).
    """
    dt = _mxu_dtype()
    shape = dense0.shape
    d = dense0.ravel()
    iota = jnp.arange(side, dtype=jnp.int32)
    oh_hi = ((d // side)[:, None] == iota).astype(dt)
    oh_lo = ((d % side)[:, None] == iota).astype(dt)
    s = flags.reshape(side, side).astype(dt)
    picked = jnp.einsum("nh,hl->nl", oh_hi, s,
                        preferred_element_type=jnp.float32)
    out = jnp.einsum("nl,nl->n", picked.astype(dt), oh_lo,
                     preferred_element_type=jnp.float32)
    return (out > 0.5).reshape(shape)


def rank_value_lookup(dense0: jax.Array, values: jax.Array,
                      side: int = _SIDE) -> jax.Array:
    """Per-pixel int32 values[dense0] without a gather.

    values: (side², ) int32 table with entries in [0, 65536]. Split into
    two 8-bit planes (each 0..256 — exactly representable in bf16), each
    fetched by the bilinear one-hot contraction of rank_flag_lookup, and
    recombined. Exact: one-hot rows have a single nonzero and the MXU
    accumulates in f32.
    """
    dt = _mxu_dtype()
    shape = dense0.shape
    d = dense0.ravel()
    iota = jnp.arange(side, dtype=jnp.int32)
    oh_hi = ((d // side)[:, None] == iota).astype(dt)
    oh_lo = ((d % side)[:, None] == iota).astype(dt)

    def fetch(plane):
        s = plane.reshape(side, side).astype(dt)
        picked = jnp.einsum("nh,hl->nl", oh_hi, s,
                            preferred_element_type=jnp.float32)
        out = jnp.einsum("nl,nl->n", picked.astype(dt), oh_lo,
                         preferred_element_type=jnp.float32)
        return jnp.round(out).astype(jnp.int32)

    lo = fetch(values & 255)
    hi = fetch(values >> 8)
    return (hi * 256 + lo).reshape(shape)


def small_mask_by_rank_hist(dense: jax.Array, domain: jax.Array,
                            threshold: int, side: int = _SIDE) -> jax.Array:
    """domain-pixels whose component (by dense rank) has < threshold
    domain-pixels. dense: 1-based ranks (valid ranks <= side²)."""
    dense0 = jnp.minimum(jnp.maximum(dense - 1, 0), side * side - 1)
    counts = counts_by_rank(dense0, domain, side)
    return jnp.logical_and(domain,
                           rank_flag_lookup(dense0, counts < threshold,
                                            side))


def small_mask_by_rank_sort(dense: jax.Array, domain: jax.Array,
                            threshold: int) -> jax.Array:
    """Sort-based fallback with identical semantics (any K)."""
    from .cc import _INF, small_component_mask_by_sort

    ids = jnp.where(domain, dense, _INF)
    return small_component_mask_by_sort(
        ids.ravel(), domain.ravel(), threshold).reshape(domain.shape)


def small_mask_guarded(dense: jax.Array, k_total: jax.Array,
                       domain: jax.Array, threshold: int) -> jax.Array:
    """Tiered histogram path by runtime rank count — 64×64 bins when
    K ≤ 4096 (16× fewer einsum FLOPs), 256×256 when K ≤ 65536, the
    bit-identical sort path above (nested lax.cond: one branch executes
    per call).

    The one-hot einsums only pay off where they ride the MXU; on CPU/GPU
    hosts (the test mesh) the sort path is used unconditionally — the
    hist path itself is pinned by tests/test_rank_areas.py directly."""
    if _mxu_dtype() is not jnp.bfloat16:
        return small_mask_by_rank_sort(dense, domain, threshold)
    return jax.lax.cond(
        k_total <= _BINS_SMALL,
        lambda d, dom: small_mask_by_rank_hist(d, dom, threshold,
                                               _SIDE_SMALL),
        lambda d, dom: jax.lax.cond(
            k_total <= _RANK_BINS,
            lambda d2, dom2: small_mask_by_rank_hist(d2, dom2, threshold),
            lambda d2, dom2: small_mask_by_rank_sort(d2, dom2, threshold),
            d, dom),
        dense, domain)
